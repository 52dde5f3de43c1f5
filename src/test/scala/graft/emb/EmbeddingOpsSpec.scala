package graft.emb

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class EmbeddingOpsSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = EmbeddingOps.embeddings(spark, sfDir).cache()

  test("vector stats: dims and positive norms") {
    val stats = EmbeddingOps.vectorStats(emb)
    assert(stats.filter(col("dim") =!= 64).count() == 0)
    assert(stats.filter(col("norm") <= 0).count() == 0)
  }

  test("brute-force top-k: k results per query, descending, no self") {
    val topk = EmbeddingOps.bruteForceTopK(emb, nQueries = 4, k = 5)
    val rows = topk.collect()
    assert(rows.length == 4 * 5)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted.reverse)
    }
  }

  test("top-k matches exhaustive argmax for one query") {
    val topk = EmbeddingOps.bruteForceTopK(emb, nQueries = 1, k = 1).head()
    // exhaustive check via the same quantized cosine on the driver
    val all = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => math.floor(x * 1024.0)))
    val q = all.find(_._1 == 0L).get._2
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(d / math.max(na * nb, 1e-12) * 10000.0) / 10000.0
    }
    val best = all.filter(_._1 != 0L)
      .map { case (id, v) => (cos(q, v), id) }
      .maxBy { case (c, id) => (c, -id) }
    assert(topk.getLong(1) == best._2)
    assert(topk.getDouble(2) == best._1)
  }

  test("LSH buckets: pairs are canonical and above threshold") {
    val pairs = EmbeddingOps.lshNearDup(emb, threshold = 0.1).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.1))
  }
}

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

  test("IVF with nprobe = nCentroids is exactly brute force; partial probe recall reported") {
    val exact = EmbeddingOps.bruteForceTopK(emb, nQueries = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val full = EmbeddingOps.ivfTopK(emb, nCentroids = 16, nprobe = 16,
      nQueries = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(full == exact) // probing every cell degenerates to exact search
    val probed = EmbeddingOps.ivfTopK(emb, nCentroids = 16, nprobe = 4,
      nQueries = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.values.zip(exact.keys).count { case (v, (q, _)) =>
      probed.contains((q, v)) }.toDouble / exact.size
    info(s"IVF recall@5 at nprobe=4/16: $recall")
    assert(recall > 0.0) // gaussian corpus has weak cells; exactness is
                         // the invariant, recall is reported
  }

  test("IVF min-struct cell assignment ≡ per-vector window argmin") {
    import org.apache.spark.sql.expressions.Window
    // the production path (groupBy + min(struct)) must assign every
    // vector to the same cell as the window-rank formulation it replaced
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast("double") * lit(1024.0)))
        .as("v"))
    val cents = d.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    // the PRODUCTION assignment metric: negated quantized cosine
    // (ivfParts) — including negative dist values so sign handling in
    // the min-struct path is exercised
    val dotC = aggregate(zip_with(col("v"), col("cv"),
      (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    def n2(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0d), (acc, x) => acc + x * x)
    val negCos = -(floor(dotC / greatest(sqrt(n2(col("v"))) *
      sqrt(n2(col("cv"))), lit(1.0e-12)) * lit(10000.0)) / lit(10000.0))
    val dists = d.crossJoin(broadcast(cents)).withColumn("dist", negCos)
    val viaWindow = dists.withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("dist"), col("cent_id"))))
      .filter(col("rnk") === 1)
      .select("vec_id", "cent_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMin = dists.groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("m.cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMin == viaWindow)
  }

  test("IVF accepts caller-supplied centroids (KMeans-shaped table)") {
    // any (cent_id, cv) table drops into the same plan — here: 8
    // midpoint centroids derived from the corpus itself
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast("double") * lit(1024.0)))
        .as("v"))
    val cents = d.filter(col("vec_id") >= 20 && col("vec_id") < 28)
      .select((col("vec_id") - 20).as("cent_id"), col("v").as("cv"))
    val r = EmbeddingOps.ivfTopK(emb, nprobe = 8, nQueries = 2, k = 3,
      centroids = Some(cents))
    val rows = r.collect()
    assert(rows.length == 6) // 2 queries × k=3
    // nprobe = all 8 cells ⇒ exact: must equal brute force
    val exact = EmbeddingOps.bruteForceTopK(emb, nQueries = 2, k = 3)
      .collect().map(x => (x.getLong(0), x.getInt(3)) -> x.getLong(1)).toMap
    assert(rows.map(x => (x.getLong(0), x.getInt(3)) -> x.getLong(1)).toMap
      == exact)
  }

  test("LSH derives dim from the data and hard-fails on a dim mismatch") {
    // derived-dim path ≡ explicit-dim path
    val a = EmbeddingOps.lshNearDup(emb, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = EmbeddingOps.lshNearDup(emb, threshold = 0.1, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // a ragged corpus must raise, not silently zero every band bit
    val ragged = emb.select("vec_id", "embedding").limit(4).unionByName(
      emb.limit(1).select((col("vec_id") + 900000L).as("vec_id"),
        slice(col("embedding"), 1, 32).as("embedding")))
    val ex = intercept[Exception] {
      EmbeddingOps.lshNearDup(ragged, threshold = 0.0).count()
    }
    assert(ex.getMessage != null)
  }

  test("LSH oracle builder follows a non-64-dim corpus: the derived dim " +
    "threads into the plane literals") {
    // a dim-8 corpus runs through the Spark op (dim derived from data)
    val small = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 8).as("embedding"))
    EmbeddingOps.lshNearDup(small, bits = 16, threshold = 0.0).count()
    // and the SQL mirror built with the SAME derived dim emits plane
    // literals of exactly that width, with the identical sign matrix
    // the Spark side projects with (Verify threads the probe result
    // into lshNearDupSql(dim = actual))
    val sql = EmbeddingOps.lshNearDupSql(bits = 16, dim = 8)
    val lists = """\[(?:-?1\.0(?:, )?)+\]""".r.findAllIn(sql).toSeq
    assert(lists.size == 16, s"expected 16 plane literals, got ${lists.size}")
    val signs = EmbeddingOps.planeSigns(16, 8)
    lists.zipWithIndex.foreach { case (l, i) =>
      val parsed = l.stripPrefix("[").stripSuffix("]")
        .split(", ").map(_.toDouble).toSeq
      assert(parsed.length == 8, s"plane $i has dim ${parsed.length}")
      assert(parsed == signs(i).toSeq, s"plane $i signs differ from Spark")
    }
  }

  test("PQ/ADC: dense ranks, cosine-bounded monotone-descending scores, " +
    "and positive recall vs brute force") {
    val r = EmbeddingOps.pqTopK(emb, nQueries = 4, topK = 5).collect()
    assert(r.length == 4 * 5)
    val byQ = r.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      // adc_cos = cosine(query, reconstruction): in [-1, 1] and
      // DESCENDING with rank
      val adcs = sorted.map(_.getDouble(2))
      assert(adcs.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(adcs.sameElements(adcs.sorted.reverse))
    }
    val exact = EmbeddingOps.bruteForceTopK(emb, nQueries = 4, k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val approx = r.map(x => (x.getLong(0), x.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"PQ recall@5 vs brute force: $recall")
    assert(recall > 0.0)
  }

  test("KMeans centroids drop into IVF; nprobe = k is still exact") {
    val cents = EmbeddingOps.kmeansCentroids(emb, k = 8)
    assert(cents.count() == 8)
    // exactness holds for ANY centroid set when every cell is probed
    val r = EmbeddingOps.ivfTopK(emb, nprobe = 8, nQueries = 2, k = 4,
      centroids = Some(cents))
    val exact = EmbeddingOps.bruteForceTopK(emb, nQueries = 2, k = 4)
      .collect().map(x => (x.getLong(0), x.getInt(3)) -> x.getLong(1)).toMap
    assert(r.collect()
      .map(x => (x.getLong(0), x.getInt(3)) -> x.getLong(1)).toMap == exact)
  }

  test("KMeans IVF beats random candidate selection: recall exceeds the " +
    "scanned corpus fraction, which the learned quantizer keeps small") {
    // recall alone is gameable — a degenerate quantizer (the demo
    // lowest-id centroids) posts high recall because one giant cell
    // makes every probe near-brute-force. The real claim of a LEARNED
    // coarse quantizer is recall >> scanned fraction at a SMALL
    // scanned fraction.
    val nC = 16; val nprobe = 4; val nQ = 4; val k = 5
    val cents = EmbeddingOps.kmeansCentroids(emb, nC)
    val scan = EmbeddingOps.ivfScanFraction(emb, nC, nprobe, nQ, Some(cents))
    val exact = EmbeddingOps.bruteForceTopK(emb, nQ, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = EmbeddingOps.ivfTopK(emb, nC, nprobe, nQ, k, Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(f"KMeans IVF recall@$k = $recall%.3f at scan fraction $scan%.3f")
    assert(scan < 0.8, s"learned cells degenerate: probe scans $scan of corpus")
    assert(recall > scan,
      s"recall $recall no better than random selection at fraction $scan")
    // and the demo quantizer's scan fraction shows WHY its recall is
    // not comparable: it probes most of the corpus
    val scanDemo = EmbeddingOps.ivfScanFraction(emb, nC, nprobe, nQ)
    info(f"demo-centroid scan fraction: $scanDemo%.3f")
  }

  test("KMeans per-subspace codebooks drop into PQ and beat the " +
    "lowest-id demo codebooks on quantization error") {
    val learned = EmbeddingOps.kmeansCodebooks(emb, m = 8, k = 16)
    assert(learned.count() == 8 * 16)
    val rLearned = EmbeddingOps.pqTopK(emb, nQueries = 4, topK = 5,
      codebooks = Some(learned)).collect()
    assert(rLearned.length == 4 * 5)
    // codebook quality = reconstruction error (the KMeans objective):
    // trained per-subspace centers must beat arbitrary corpus rows
    val errLearned = EmbeddingOps.pqReconstructionError(emb,
      codebooks = Some(learned))
    val errDemo = EmbeddingOps.pqReconstructionError(emb)
    info(s"PQ reconstruction error learned=$errLearned demo=$errDemo")
    assert(errLearned < errDemo)
  }

  test("LSH recall >= 0.9 on planted near-dup vectors") {
    // plant a near-identical copy of every vector (deterministic small
    // perturbation, cosine ≈ 0.999); ground truth = (i, i + 100000)
    val perturbed = emb.select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), (x, j) =>
        x + lit(0.02) * sin(col("vec_id").cast("double") + j.cast("double")))
        .cast("array<float>").as("embedding"))
    val planted = emb.select("vec_id", "embedding").unionByName(perturbed)
    val truth = emb.count()
    val found = EmbeddingOps.lshNearDup(planted, threshold = 0.9)
      .filter(col("id_r") === col("id_l") + 100000L)
      .count()
    val recall = found.toDouble / truth
    info(s"LSH recall on planted near-dups: $recall ($found / $truth)")
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("LSH hot-bucket cap drops oversized buckets") {
    // 300 identical vectors land in one bucket per band (> cap 200):
    // the in-bucket self-join would be quadratic → bucket dropped
    val hot = spark.range(300).select(col("id").as("vec_id"),
      typedLit(Seq.fill(64)(1.0f)).as("embedding"))
    assert(EmbeddingOps.lshNearDup(hot, threshold = 0.0).count() == 0)
    // with a cap above the bucket size the pairs come back
    assert(EmbeddingOps.lshNearDup(hot, threshold = 0.0,
      bucketCap = 400).count() == 300L * 299 / 2)
  }
}

package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class TfIdfSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("pairs with token-less records survive with cosine 0.0") {
    val recs = Seq(
      ("a", "x y"), ("b", ""), ("c", "x y"), ("d", "p"), ("e", "q"))
      .toDF("conv_id", "full_text")
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("id_l", "id_r")
    val out = TfIdf.cosine(pairs, recs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // the empty-text record keeps its pair (no silent drop), cosine 0
    assert(out.size == 2)
    assert(out(("a", "b")) == 0.0)
    // identical token sets → cosine 1 up to the floor-1e-4 grid
    // (sqrt in the norms is irrational → 0.9999, never above)
    assert(out(("a", "c")) >= 0.9999)
  }

  test("df caps drop ubiquitous tokens before the pair join") {
    // "the" appears in all 6 docs → relative cap (df > N/2) removes it;
    // a and b share ONLY "the", so their cosine collapses to 0
    val recs = Seq(
      ("a", "the alpha"), ("b", "the beta"), ("c", "the gamma"),
      ("d", "the delta"), ("e", "the epsilon"), ("f", "the zeta"))
      .toDF("conv_id", "full_text")
    val pairs = Seq(("a", "b")).toDF("id_l", "id_r")
    val out = TfIdf.cosine(pairs, recs).head()
    assert(out.getDouble(2) == 0.0)
    // absolute cap: maxDf = 0 removes every token → all-zero cosines,
    // but the pair still comes back
    val capped = TfIdf.cosine(pairs, recs, maxDf = 0L)
    assert(capped.count() == 1 && capped.head().getDouble(2) == 0.0)
  }
}

package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DistancesSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("token-set metric menu: hand-checked coefficients") {
    // A = {a,b,c}, B = {b,c,d}: |∩|=2, |∪|=4, |A|=|B|=3
    val recs = Seq(
      ("x", "a b c"), ("y", "b c d"), ("z", ""))
      .toDF("conv_id", "head_text")
    val pairs = Seq(("x", "y"), ("x", "z"), ("z", "z")).toDF("id_l", "id_r")
    val plan = Seq("jaccard", "dice", "overlap", "cosine")
      .map(m => Distances.AttrSim("head_text", m))
    val out = Distances.featuresFor(pairs, recs, plan)
    assert(out.columns.toSeq == Seq("id_l", "id_r",
      "jaccard_head_text", "dice_head_text", "overlap_head_text",
      "cosine_head_text"))
    val rows = out.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // jaccard 2/4, dice 2*2/6, overlap 2/3, cosine 2/3 (floor-1e-4)
    assert(rows(("x", "y")) == ((0.5, 0.6666, 0.6666, 0.6666)))
    // one empty side → all coefficients 0
    assert(rows(("x", "z")) == ((0.0, 0.0, 0.0, 0.0)))
    // both empty → identical → 1
    assert(rows(("z", "z")) == ((1.0, 1.0, 1.0, 1.0)))
  }

  test("hamming similarity: equal-length mismatch count, unequal -> 0") {
    val recs = Seq(("x", "abcd"), ("y", "abed"), ("z", "ab"), ("w", ""))
      .toDF("conv_id", "head_text")
    val pairs = Seq(("x", "y"), ("x", "z"), ("w", "w")).toDF("id_l", "id_r")
    val out = Distances.featuresFor(pairs, recs,
      Seq(Distances.AttrSim("head_text", "hamming")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out(("x", "y")) == 0.75) // 1 mismatch of 4
    assert(out(("x", "z")) == 0.0)  // unequal length
    assert(out(("w", "w")) == 1.0)  // both empty
  }

  test("default plan through featuresFor equals the hardwired kernel") {
    val recs = Seq(
      ("p", "alpha beta", "u a", "alpha beta gamma"),
      ("q", "alpha bets", "u t a", "alpha bets gamma"))
      .toDF("conv_id", "head_text", "role_seq", "full_text")
    val pairs = Seq(("p", "q")).toDF("id_l", "id_r")
    val viaPlan = Distances.featuresFor(pairs, recs, Distances.defaultPlan)
      .head()
    val viaKernel = Distances.features(pairs, recs).head()
    assert(viaPlan == viaKernel)
    assert(viaPlan.schema.fieldNames.toSeq ==
      Seq("id_l", "id_r") ++ Distances.featureCols)
  }
}

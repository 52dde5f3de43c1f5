package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Golden tests for the alignment DPs (no DuckDB mirror exists, so the
  * oracle can't check these — hand-computed cases pin the kernels). */
class AlignmentSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def run(metric: String, a: String, b: String): Double = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(Distances.metricCol(metric, col("a"), col("b")).as("s"))
      .head().getDouble(0)
  }

  test("nw = LCS similarity: hand-computed goldens") {
    // LCS(kitten, sitting) = ittn (4): sim = 2*4/13
    assert(math.abs(run("nw", "kitten", "sitting") - 8.0 / 13.0) < 1e-12)
    assert(run("nw", "abc", "abc") == 1.0)
    assert(run("nw", "abc", "xyz") == 0.0)
    assert(run("nw", "", "") == 1.0)
    assert(run("nw", "abc", "") == 0.0)
    // symmetric
    assert(run("nw", "alpha beta", "beta alpha") ==
      run("nw", "beta alpha", "alpha beta"))
  }

  test("sw local alignment: shared core scores regardless of flanks") {
    // local core 'abc' (+2 each) inside disjoint flanks: best = 6,
    // min(|a|,|b|) = 7 → 6/14
    assert(math.abs(run("sw", "xxabcxx", "yyabcyy") - 6.0 / 14.0) < 1e-12)
    assert(run("sw", "abc", "abc") == 1.0)
    assert(run("sw", "abc", "xyz") == 0.0)
    assert(run("sw", "", "") == 1.0)
    assert(run("sw", "", "abc") == 0.0)
  }

  test("swg affine gaps beat linear gaps on one long gap") {
    // 'abcdef' vs 'abcxxxxdef': sw pays 4 × (−1) = −4 → (12−4)/12;
    // swg pays −2 − 3×0.5 = −3.5 → (12−3.5)/12 — affine must win
    val linear = run("sw", "abcdef", "abcxxxxdef")
    val affine = run("swg", "abcdef", "abcxxxxdef")
    assert(math.abs(linear - 8.0 / 12.0) < 1e-12)
    assert(math.abs(affine - 8.5 / 12.0) < 1e-12)
    assert(affine > linear)
    assert(run("swg", "abc", "abc") == 1.0)
    assert(run("swg", "", "") == 1.0)
    assert(run("swg", "abc", "") == 0.0)
  }

  test("full 17-metric menu evaluates on one row (no unresolved metric)") {
    val df = Seq(("john a smith", "john smith")).toDF("a", "b")
    val row = df.select(Distances.fullMenu.map(m =>
      Distances.metricCol(m, col("a"), col("b")).as(m)): _*).head()
    Distances.fullMenu.indices.foreach { i =>
      val v = row.getDouble(i)
      assert(v >= 0.0 && v <= 1.0,
        s"${Distances.fullMenu(i)} out of [0,1]: $v")
    }
  }
}

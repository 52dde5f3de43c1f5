package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The BASELINE.json gate: the full learned-blocking pipeline must
  * reproduce the planted entity clusters at pairwise F1 ≥ 0.99 on the
  * labeled evaluation set (north rule).
  */
class DedupeE2ESpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("end-to-end dedupe reaches pairwise F1 >= 0.99 at sf0.001") {
    val result = Dedupe.run(spark, sfDir, Dedupe.Config(trainN = 300))
    val (f1, tp, fp, fn) = Dedupe.pairwiseF1(spark, sfDir, result.scored)
    info(s"f1=$f1 tp=$tp fp=$fp fn=$fn " +
      s"conjunctions=${result.conjunctions.take(3).map(_.conjunction)}")
    assert(f1 >= 0.99, s"pairwise F1 $f1 below gate (tp=$tp fp=$fp fn=$fn)")

    // clusters: every truth pair ends in the same component
    val truth = graft.block.Labels.truthPairs(spark, sfDir)
    val comp = result.clusters
    val joined = truth
      .join(comp.select(col("id").as("id_l"), col("component").as("c_l")), "id_l")
      .join(comp.select(col("id").as("id_r"), col("component").as("c_r")), "id_r")
    assert(joined.filter(col("c_l") =!= col("c_r")).count() == 0)

    // CC superstep trail exists (convergence checkpointed per superstep)
    assert(result.ccSupersteps.size >= 2)
  }
}

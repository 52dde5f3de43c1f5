package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.{Blocking, ConjStats, Labels, Learner}
import graft.cluster.ConnectedComponents
import graft.io.TableIO
import graft.ml.MatchClassifier
import graft.normalize.Normalize
import graft.sim.Distances
import graft.synth.Transcripts

/** End-to-end dedupe pipeline — the Spark rebuild of the reference's
  * three entry points (oagdedupe api.py: initialize → fit_blocks →
  * predict, SURVEY.md §3) collapsed into one driver program:
  *
  *   transcripts → normalize → learn conjunctions on a train sample →
  *   blocked candidate pairs under a pair budget → similarity features →
  *   logistic match classifier → score > threshold edges →
  *   large-star/small-star connected components → clusters (+
  *   singletons) joined back to records.
  *
  * Every stage can be checkpointed through [[graft.io.TableIO]]
  * (resume-from-checkpoint per the north rule) when `workDir` is given;
  * with `workDir = None` the pipeline runs fully in-memory (tests).
  */
object Dedupe {

  final case class Config(
      k: Int = 3,
      seedRrCut: Double = 0.99,
      maxBlockSize: Int = Blocking.DefaultMaxBlockSize,
      nCovered: Long = 500000L, // reference settings.py:47-48
      maxCompare: Long = 1000000L, // reference settings.py:44-45
      threshold: Double = 0.8,  // reference cluster/cluster.py:24
      // cap on labeled pairs fed to the learner + classifier (0 = all):
      // stratified seeded sample per class. The reference trains from a
      // SMALL annotated set (pos/neg samples + active-learning rounds,
      // initialize.py:100-115) — handing every planted truth pair to
      // the DP learner made the learner stage scale with corpus size
      // (345 s of a 545 s sf0.1 run) for no estimate quality gain:
      // rr/coverage statistics converge with hundreds of labels.
      maxTrainLabels: Int = 2000,
      // how many top-ranked seed schemes the DP refines (weaker passing
      // seeds keep their depth-1 stats in the learned list) — each
      // refined seed costs ~2 corpus-scale stats batches, and refining
      // the tail seeds buys coverage the budget loop already has: at
      // sf0.1 the 3 lowest-ranked of 12 seeds cost 128 s of the 205 s
      // learner stage and changed nothing in the applied prefix
      maxDpSeeds: Int = 8,
      seed: Long = 42L,
      useMlClassifier: Boolean = true,
      // which spark.ml algorithm backs the match classifier: logistic
      // (north-star default) or random_forest (the reference's actual
      // sklearn model, fapi.py:161-184)
      classifier: String = MatchClassifier.Logistic,
      // runtime-configurable attributes (reference settings.py:77 +
      // dynamic table generation tables.py:74-103): which attributes
      // the blocking learner may use, and which (attr, metric)
      // similarity columns the classifier sees
      blockingAttrs: Seq[String] = Normalize.blockingAttributes,
      features: Seq[Distances.AttrSim] = Distances.defaultPlan)

  /** min_rr / max_compare stop condition (reference
    * db/postgres/blocking.py:74-86): with n records the full-data
    * comparison space is C(n,2); a conjunction whose reduction ratio
    * falls below 1 − maxCompare / C(n,2) would admit more than
    * maxCompare pairs on its own, so it — and everything after it in
    * the best-first list — is refused. (rr here is the learner's
    * train-sample estimate, the same quantity the reference thresholds.)
    */
  def applicableConjunctions(conjunctions: Seq[ConjStats], nRecords: Long,
                             maxCompare: Long): Seq[ConjStats] = {
    val nComparisons = nRecords.toDouble * (nRecords - 1) / 2.0
    if (nComparisons <= 0) conjunctions
    else {
      val minRr = 1.0 - maxCompare / nComparisons
      conjunctions.takeWhile(_.rr >= minRr)
    }
  }

  final case class Result(
      records: DataFrame,
      pairs: DataFrame,
      scored: DataFrame,
      clusters: DataFrame,
      conjunctions: Seq[ConjStats],
      ccSupersteps: Seq[ConnectedComponents.Superstep])

  /** U1: train union — records of every labeled pair ∪ an exact-n
    * uniform sample (reference pos ∪ neg ∪ unlabelled,
    * initialize.py:100-115). The sample orders by a seeded md5 instead
    * of an engine RNG: same uniform-without-replacement semantics, but
    * deterministic across engines AND runs (resume re-derives the
    * identical sample; TakeOrdered plan — per-partition heap + driver
    * merge of n rows, no full sort).
    */
  def trainSample(records: DataFrame, labels: DataFrame, trainN: Int,
                  seed: Long): DataFrame = {
    val labeledIds = labels.select(col("id_l").as("conv_id"))
      .unionByName(labels.select(col("id_r").as("conv_id"))).distinct()
    records.join(labeledIds, Seq("conv_id"), "left_semi")
      .unionByName(records
        .orderBy(md5(concat(lit(s"$seed:"), col("conv_id"))),
          col("conv_id"))
        .limit(trainN))
      .dropDuplicates("conv_id")
  }

  def run(spark: SparkSession, sfDir: String, cfg: Config = Config(),
          workDir: Option[String] = None): Result = {
    val io = workDir.map(new TableIO(spark, _))
    def staged(name: String, inputs: Seq[String])(f: => DataFrame): DataFrame =
      io match {
        case Some(t) => t.stage(name, inputs)(f)
        case None => f
      }

    // 1. ingest + normalize (stable turn ordering invariant)
    val records = staged("records", Seq(sfDir)) {
      Normalize.normalize(Transcripts.transcripts(spark, sfDir))
    }.cache()

    // 2. labeled pairs (planted-duplicate truth, reference
    //    initialize.py:117-135 analog), capped per cfg.maxTrainLabels —
    //    md5-seeded per-class sample: deterministic across runs/engines
    //    and balanced (both classes survive whatever the corpus ratio)
    val labelsAll = Labels.plantedLabels(spark, sfDir)
    val labels = (if (cfg.maxTrainLabels > 0) {
      val perClass = math.max(cfg.maxTrainLabels / 2, 1)
      def strat(v: Int) = labelsAll.filter(col("label") === v)
        .orderBy(md5(concat(lit(s"${cfg.seed}:"), col("id_l"),
          lit("|"), col("id_r"))), col("id_l"), col("id_r"))
        .limit(perClass)
      strat(1).unionByName(strat(0))
    } else labelsAll).cache()

    // 3. learn blocking conjunctions (greedy DP, optimizers.py:73-99)
    //    — stats evaluated on the FULL corpus with the real frequency
    //    cap (see Learner scaladoc; labeled coverage joins touch only
    //    the labeled slice). The learned list is itself a checkpointed
    //    stage: on resume the (dominant-cost) DP search is skipped
    //    entirely.
    import spark.implicits._
    val nRecords = records.count()
    val conjunctions = staged("conjunctions", Seq("records")) {
      val learner = new Learner(records, labels, cfg.blockingAttrs,
        cfg.k, cfg.seedRrCut, cfg.maxBlockSize,
        maxDpSeeds = cfg.maxDpSeeds)
      val learned = learner.learn()
      learner.unpersist()
      learned.toDF()
    }.as[ConjStats].collect().toSeq
      .sortBy(_.key)(Ordering[(Double, Long, Long)].reverse)
    require(conjunctions.nonEmpty, "learner found no viable conjunction")
    val schemeByName = graft.block.Schemes.byName(cfg.blockingAttrs)

    // 5. candidate pairs on FULL data, best conjunctions first, under
    //    TWO budgets (blocking.py:43-98): the covered-pair budget
    //    (n_covered) and the min_rr/max_compare refusal — a low-rr
    //    conjunction late in the list is never applied. The reference
    //    counts after EVERY conjunction (one SQL round-trip each); here
    //    conjunctions are applied in chunks — one unioned Spark job +
    //    one count per chunk — preserving the best-first budget
    //    semantics at a fraction of the job count.
    val admitted = applicableConjunctions(conjunctions, nRecords,
      cfg.maxCompare)
    require(admitted.nonEmpty,
      "min_rr stop refused every learned conjunction")
    val pairs = staged("pairs", Seq("records")) {
      var acc: DataFrame = null
      var covered = 0L
      val chunks = admitted.grouped(8)
      while (chunks.hasNext && covered < cfg.nCovered) {
        val chunk = chunks.next()
        val p = chunk.map(s => Blocking.candidatePairs(records,
            s.conjunction.map(schemeByName), "conv_id",
            cfg.maxBlockSize))
          .reduce(_ unionByName _)
          .dropDuplicates("id_l", "id_r")
        acc = if (acc == null) p
          else acc.unionByName(p.join(acc, Seq("id_l", "id_r"), "left_anti"))
        acc = acc.localCheckpoint() // cut lineage per budget step
        covered = acc.count()
      }
      acc
    }

    // 6. similarity feature vectors (M1; JW/Levenshtein/Jaccard +
    //    TF-IDF cosine — the north star's batched similarity vector).
    //    The TF-IDF weight/norm relations are corpus-scale token
    //    aggregations shared by BOTH featurize call sites (candidate
    //    pairs here, labeled training pairs in the classifier stage) —
    //    computed once and cached, not re-tokenized per call.
    val (tfW0, tfN0) = graft.sim.TfIdf.weights(records, "conv_id",
      "full_text", graft.sim.TfIdf.DefaultMaxDf, Some(nRecords))
    val tfW = tfW0.cache()
    val tfN = tfN0.cache()
    def featurize(p: DataFrame): DataFrame =
      Distances.featuresFor(p, records, cfg.features)
        .join(graft.sim.TfIdf.cosineWith(p.select("id_l", "id_r"),
          tfW, tfN),
          Seq("id_l", "id_r"))
    val allFeatureCols = cfg.features.map(_.colName) :+ "tfidf_cos"
    val feats = staged("features", Seq("pairs", "records")) {
      featurize(pairs)
    }

    // 7. score: logistic classifier trained on the labeled pairs
    //    (M2/M3) or the deterministic rule score
    val scored = staged("scores", Seq("features")) {
      if (cfg.useMlClassifier) {
        // model persistence (reference joblib dump/reload,
        // fapi.py:161-176): with a workDir the fitted model is saved
        // under <workDir>/model and a resumed run LOADS it instead of
        // retraining.
        val model = MatchClassifier.trainOrLoad(
          workDir.map(_ + "/model"), allFeatureCols, cfg.classifier) {
          featurize(labels.select("id_l", "id_r"))
            .join(labels, Seq("id_l", "id_r"))
        }
        MatchClassifier.score(model, feats, allFeatureCols)
      } else {
        Distances.ruleScore(feats).select("id_l", "id_r", "score")
      }
    }

    // 8. threshold → edges → connected components (C1) + singletons (U3)
    val edges = scored.filter(col("score") > cfg.threshold)
    val (components, steps) = ConnectedComponents.run(edges)
    val clusters = staged("clusters", Seq("scores", "records")) {
      val singles = records.select(col("conv_id"))
        .join(components.select(col("id").as("conv_id")),
          Seq("conv_id"), "left_anti")
        .select(col("conv_id").as("id"), col("conv_id").as("component"))
      components.unionByName(singles)
    }

    Result(records, pairs, scored, clusters, conjunctions, steps)
  }

  /** J6: final result assembly — clusters joined back to records. */
  def assemble(result: Result): DataFrame =
    result.records.join(
      result.clusters.withColumnRenamed("id", "conv_id"),
      Seq("conv_id"), "left")
      .orderBy(col("component"), col("conv_id"))

  /** Pairwise F1 of predicted match pairs vs planted truth — the
    * BASELINE.json gate (≥ 0.99).
    */
  def pairwiseF1(spark: SparkSession, sfDir: String, scored: DataFrame,
                 threshold: Double = 0.8): (Double, Long, Long, Long) = {
    val predicted = scored.filter(col("score") > threshold)
      .select("id_l", "id_r").distinct().cache()
    val truth = Labels.truthPairs(spark, sfDir).cache()
    val tp = predicted.join(truth, Seq("id_l", "id_r"), "left_semi").count()
    val fp = predicted.count() - tp
    val fn = truth.count() - tp
    // release: callers (e.g. the active-learning loop) evaluate this
    // repeatedly — leaving the cache pinned would accumulate per round
    predicted.unpersist()
    truth.unpersist()
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val f1 = if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
    (f1, tp, fp, fn)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.{Blocking, BoundScheme, FindNgrams, FirstNChars, Labels, Learner}
import graft.cluster.ConnectedComponents
import graft.ml.MatchClassifier
import graft.normalize.Normalize
import graft.pipeline.Dedupe
import graft.sim.Distances
import graft.synth.Transcripts

/** Extra measurement mains (guide §1.4: noop-sink isolation; §1.5: job
  * labels). NOT part of the frozen driver bench — graft.Bench is the
  * graded artifact; this exists so OPTIMIZATION_r06.md can cite
  * stage-isolated numbers without touching the frozen harness.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra [sfDir]"       — bench stages
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra [sfDir] e2e"   — e2e decomposition
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "stages"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[extra] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (mode == "passes") {
      // Long-region scaling measurement (guide §1.1/§1.3; VERDICT r05
      // task 1): the frozen bench's single full-set scoring pass is
      // ~9 s at 32 cores — short enough that per-pass fixed overhead
      // (job submit, task-wave ramp, straggler tail) reads as a fake
      // efficiency droop at high core counts. This mode times K
      // CONSECUTIVE full-set passes as one region and divides — same
      // plan, same action, same cache as graft.Bench — so the region
      // is K× longer while per-pair work is identical.
      // SPARK_GRAFT_EXTRA_PARTS overrides the hydrated-cache partition
      // count (the bench uses 4×cores, which changes task granularity
      // WITH the core count; pinning e.g. 128 at every core count
      // isolates kernel CPU scaling from wave-granularity effects).
      val k = if (args.length > 2) args(2).toInt else 5
      val parts = sys.env.get("SPARK_GRAFT_EXTRA_PARTS").map(_.toInt)
        .getOrElse(cpus * 4)
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
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
      val nPairs = allPairs.count()
      spark.conf.set("spark.sql.shuffle.partitions", (cpus * 4).toString)
      val hydrated = Distances.hydrate(allPairs, records,
        Distances.featureAttrs)
        .repartition(parts)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      hydrated.count()
      def evalScored(h: DataFrame): Unit = {
        Distances.ruleScore(Distances.featuresFromHydrated(h))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("score")), lit(0.0)).as("s")).head()
        ()
      }
      evalScored(hydrated.limit(10000)) // codegen + JIT warmup
      evalScored(hydrated) // one full warm pass (page-cache + decode ramp)
      val per = new Array[Double](k)
      spark.sparkContext.setJobDescription(s"scoring x$k region")
      val t0 = System.nanoTime()
      var i = 0
      while (i < k) {
        val p0 = System.nanoTime()
        evalScored(hydrated)
        per(i) = (System.nanoTime() - p0) / 1e9
        i += 1
      }
      val region = (System.nanoTime() - t0) / 1e9
      val perPass = region / k
      println(f"[extra] passes=$k parts=$parts cpus=$cpus " +
        f"region=$region%.2f s per_pass=$perPass%.3f s " +
        f"pairs_per_sec=${nPairs / perPass}%.0f " +
        s"per=[${per.map(p => f"$p%.2f").mkString(",")}]")
    } else if (mode == "stages") {
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      val records = time("normalize (cache+count)") {
        val r = Normalize.normalize(Transcripts.transcripts(spark, sfDir))
          .cache()
        r.count(); r
      }
      val prefix8 = Seq(BoundScheme(FirstNChars(8), "head_text"))
      val ngram6 = Seq(BoundScheme(FindNgrams(6), "head_text"))
      val pairsPrefix = time("blocking prefix8 (noop)") {
        val p = Blocking.candidatePairs(records, prefix8, "conv_id",
          Blocking.DefaultMaxBlockSize)
        noop(p); p
      }
      time("blocking ngram6 (noop)") {
        noop(Blocking.candidatePairs(records, ngram6, "conv_id",
          Blocking.DefaultMaxBlockSize))
      }
      val allPairs = time("blocking union (localCheckpoint)") {
        val p = Blocking.unionPairs(Seq(
          Blocking.candidatePairs(records, prefix8, "conv_id",
            Blocking.DefaultMaxBlockSize),
          Blocking.candidatePairs(records, ngram6, "conv_id",
            Blocking.DefaultMaxBlockSize))).localCheckpoint()
        p.count(); p
      }
      spark.conf.set("spark.sql.shuffle.partitions", (cpus * 4).toString)
      time("hydration join only (noop)") {
        noop(Distances.hydrate(allPairs, records, Distances.featureAttrs))
      }
      time("hydration join+repart (noop)") {
        noop(Distances.hydrate(allPairs, records, Distances.featureAttrs)
          .repartition(cpus * 4))
      }
      val hydrated = time("hydration bench action (persist)") {
        val h = Distances.hydrate(allPairs, records, Distances.featureAttrs)
          .repartition(cpus * 4)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        h.count(); h
      }
      def evalScored(h: DataFrame): Unit = {
        Distances.ruleScore(Distances.featuresFromHydrated(h))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("score")), lit(0.0)).as("s")).head()
        ()
      }
      evalScored(hydrated.limit(10000)) // warmup
      time("scoring pass1")(evalScored(hydrated))
      time("scoring pass2")(evalScored(hydrated))
      // kernel-free baseline over the same cache: how much of a scoring
      // pass is columnar-cache scan/decode vs similarity CPU
      time("cache scan baseline (no kernel)") {
        hydrated.agg(sum(
          length(col("head_text_l")) + length(col("head_text_r")) +
            length(col("full_text_l")) + length(col("full_text_r")) +
            length(col("role_seq_l")) + length(col("role_seq_r")))).head()
        ()
      }
    } else if (mode == "features") {
      // per-feature kernel attribution over the same DISK_ONLY cache the
      // bench scores (which feature owns the scoring seconds)
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
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
      spark.conf.set("spark.sql.shuffle.partitions", (cpus * 4).toString)
      val hydrated = Distances.hydrate(allPairs, records,
        Distances.featureAttrs)
        .repartition(cpus * 4)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      hydrated.count()
      import graft.sim.Similarity
      val feats = Seq(
        "jw_head" -> Similarity.jw(col("head_text_l"), col("head_text_r")),
        "jw_role" -> Similarity.jw(col("role_seq_l"), col("role_seq_r")),
        "jw_full" -> Similarity.jw(col("full_text_l"), col("full_text_r")),
        "lev_full" -> Similarity.levSim(col("full_text_l"),
          col("full_text_r")),
        "jac_full" -> Similarity.tokenJaccard(col("full_text_l"),
          col("full_text_r")))
      // warmup
      hydrated.limit(10000).agg(sum(feats.map(_._2).reduce(_ + _))).head()
      hydrated.agg(count(lit(1))).head()
      feats.foreach { case (name, c) =>
        time(s"feature $name only")(hydrated.agg(sum(c)).head())
      }
      time("all five features") {
        hydrated.agg(sum(feats.map(_._2).reduce(_ + _))).head()
      }
    } else if (mode == "e2e") {
      // stage decomposition of Dedupe.run (same calls, same config, with
      // per-stage barriers so each cost is attributable)
      val cfg = Dedupe.Config()
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      val records = time("e2e records (cache+count)") {
        val r = Normalize.normalize(Transcripts.transcripts(spark, sfDir))
          .cache()
        r.count(); r
      }
      val nRecords = records.count()
      val labels = time("e2e labels") {
        val l = Labels.plantedLabels(spark, sfDir)
        val perClass = math.max(cfg.maxTrainLabels / 2, 1)
        def strat(v: Int) = l.filter(col("label") === v)
          .orderBy(md5(concat(lit(s"${cfg.seed}:"), col("id_l"),
            lit("|"), col("id_r"))), col("id_l"), col("id_r"))
          .limit(perClass)
        val s = strat(1).unionByName(strat(0)).cache()
        s.count(); s
      }
      val learner = new Learner(records, labels, cfg.blockingAttrs,
        cfg.k, cfg.seedRrCut, cfg.maxBlockSize,
        maxCompare = cfg.maxCompare, dpParallelism = cfg.dpParallelism)
      val conjunctions = time("e2e learner.learn()") {
        val l = learner.learn()
        learner.unpersist(); l
      }
      val schemeByName = graft.block.Schemes.byName(cfg.blockingAttrs)
      val admitted = Dedupe.applicableConjunctions(conjunctions, nRecords,
        cfg.maxCompare)
      val pairs = time("e2e budget pair loop") {
        var acc: DataFrame = null
        var covered = 0L
        val chunks = admitted.grouped(8)
        while (chunks.hasNext && covered < cfg.nCovered) {
          val chunk = chunks.next()
          val p = chunk.map(s => Blocking.candidatePairs(records,
              s.conjunction.map(schemeByName), "conv_id", cfg.maxBlockSize))
            .reduce(_ unionByName _)
            .dropDuplicates("id_l", "id_r")
          acc = if (acc == null) p
            else acc.unionByName(p.join(acc, Seq("id_l", "id_r"), "left_anti"))
          acc = acc.localCheckpoint()
          covered = acc.count()
        }
        acc
      }
      println(s"[extra] pairs = ${pairs.count()}")
      val (tfW0, tfN0) = graft.sim.TfIdf.weights(records, "conv_id",
        "full_text", graft.sim.TfIdf.DefaultMaxDf, Some(nRecords))
      val tfW = tfW0.cache()
      val tfN = tfN0.cache()
      def featurize(p: DataFrame): DataFrame =
        Distances.featuresFor(p, records, cfg.features)
          .join(graft.sim.TfIdf.cosineWith(p.select("id_l", "id_r"),
            tfW, tfN), Seq("id_l", "id_r"))
      val allFeatureCols = cfg.features.map(_.colName) :+ "tfidf_cos"
      val trainFeats = time("e2e featurize(labels) (checkpoint)") {
        featurize(labels.select("id_l", "id_r"))
          .join(labels, Seq("id_l", "id_r")).localCheckpoint()
      }
      val model = time("e2e classifier fit") {
        MatchClassifier.train(trainFeats, allFeatureCols, cfg.classifier)
      }
      val feats = time("e2e featurize(pairs) (checkpoint)") {
        featurize(pairs).localCheckpoint()
      }
      val scored = time("e2e score (checkpoint)") {
        MatchClassifier.score(model, feats, allFeatureCols).localCheckpoint()
      }
      tfW.unpersist(); tfN.unpersist(); labels.unpersist()
      val clusters = time("e2e CC + singletons") {
        val edges = scored.filter(col("score") > cfg.threshold)
        val (components, _) = ConnectedComponents.run(edges)
        val singles = records.select(col("conv_id"))
          .join(components.select(col("id").as("conv_id")),
            Seq("conv_id"), "left_anti")
          .select(col("conv_id").as("id"), col("conv_id").as("component"))
        val c = components.unionByName(singles)
        println(s"[extra] clusters rows = ${c.count()}")
        c
      }
      val _ = clusters
    }
    spark.stop()
  }
}

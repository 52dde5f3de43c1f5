package graft.block

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Stats for one conjunction, reference StatsDict (_typing.py:81-90). */
final case class ConjStats(
    conjunction: Seq[String],
    nPairs: Long,
    positives: Long,
    negatives: Long,
    rr: Double) {
  /** reference ordering key (db/base.py:94-106): desc by
    * (rr, positives, -negatives). */
  def key: (Double, Long, Long) = (rr, positives, -negatives)
}

/** Greedy dynamic-program conjunction learner — faithful to
  * oagdedupe block/optimizers.py:73-99 + block/learner.py:51-67:
  *
  *   - seeds: every single bound scheme; pruned unless positives > 0 and
  *     rr ≥ seedRrCut (optimizers.py:87, hardcoded 0.99)
  *   - depth 1..k-1: extend the previous best with every other scheme,
  *     keep candidates passing `_keep_if` (optimizers.py:52-61:
  *     positives>0, rr<1, n_pairs>1, ≤1 n-gram scheme), take the best by
  *     (rr, positives, −negatives)
  *   - final list = flatten all DP cells, dedupe, sort desc by the same
  *     key (learner.py:64-66)
  *
  * Execution: where the reference issues ONE POSTGRES QUERY PER
  * CANDIDATE CONJUNCTION (blocking.py:196-254) from a process pool,
  * here every DP step scores ALL extensions of a base in ONE Spark job:
  * the per-extension inverted indexes are unioned under a `_x` tag
  * column, self-joined on (tag, signatures), left-joined to labels and
  * aggregated grouped by tag (J3+A1 batched). The train sample is tiny
  * (reference n=5000) and cached, so the whole search is
  * O(k × #seeds-passing) jobs instead of O(k × 44²). Scores are
  * memoized across seeds (reference @lru_cache, optimizers.py:37-50).
  */
final class Learner(
    train: DataFrame,
    labels: DataFrame,
    attrs: Seq[String],
    k: Int = 3,
    seedRrCut: Double = 0.99,
    maxBlockSize: Int = Blocking.DefaultMaxBlockSize,
    idCol: String = "conv_id") {

  val schemes: Seq[BoundScheme] = Schemes.forAttributes(attrs)
  private val byName: Map[String, BoundScheme] =
    schemes.map(b => b.name -> b).toMap
  private val cache = mutable.Map.empty[Seq[String], ConjStats]

  private val trainCached = train.cache()
  private val labelsCached = labels.cache()
  private lazy val nComparisons: Double = {
    val n = trainCached.count().toDouble
    n * (n - 1) / 2.0
  }

  /** Optional progress logging (-Dgraft.verbose=true or GRAFT_VERBOSE=1). */
  private val verbose = sys.props.get("graft.verbose").contains("true") ||
    sys.env.get("GRAFT_VERBOSE").contains("1")
  private def log(msg: => String): Unit =
    if (verbose) System.err.println(s"[learner] $msg")

  /** Score `base ∧ x` for every x in `exts` — one Spark job total.
    *
    * Shape: the extension signatures are MELTED into one narrow
    * (id, _x, sig_e) DataFrame (33 trivial scans of the cached train
    * sample, no per-extension joins), joined to the base-conjunction
    * signature tuple, capped with a window count, self-joined once on
    * (_x, base sigs, sig_e) and aggregated once grouped by _x. Three
    * shuffles per DP step regardless of extension count — a naive
    * per-extension union was ~150 sequential AQE stages.
    */
  def scoreBatch(base: Seq[String], exts: Seq[String]): Map[String, ConjStats] = {
    val missing = exts.filterNot(x => cache.contains(((base :+ x).sorted)))
    val t0 = System.nanoTime()
    if (missing.nonEmpty) {
      val boundBase = base.map(byName)
      val baseDF =
        if (base.isEmpty) trainCached.select(col(idCol))
        else Blocking.invertedIndex(trainCached, boundBase, idCol)
      val melted = missing.map { x =>
        val b = byName(x)
        val e = if (b.isArray) explode(array_distinct(b.scheme.expr(b.attr)))
          else b.scheme.expr(b.attr)
        trainCached.select(col(idCol), lit(x).as("_x"), e.as("sig_e"))
      }.reduce(_ unionByName _)
        .filter(col("sig_e").isNotNull && col("sig_e") =!= "")
      val inv = baseDF.join(melted, idCol)
      val sigCols = base.indices.map(i => s"sig_$i")
      val keyCols = ("_x" +: sigCols) :+ "sig_e"
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
      val capped = inv
        .withColumn("_n", count(lit(1)).over(w))
        .filter(col("_n") <= maxBlockSize)
        .drop("_n")
      val l = capped.select((col(idCol).as("id_l") +: keyCols.map(col)): _*)
      val r = capped.select((col(idCol).as("id_r") +: keyCols.map(col)): _*)
      val pairs = l.join(r, keyCols)
        .filter(col("id_l") < col("id_r"))
        .dropDuplicates("_x" :: "id_l" :: "id_r" :: Nil)
      val rows = pairs
        .join(labelsCached, Seq("id_l", "id_r"), "left")
        .groupBy(col("_x"))
        .agg(
          count(lit(1)).as("n"),
          coalesce(sum(when(col("label") === 1, 1L)), lit(0L)).as("pos"),
          coalesce(sum(when(col("label") === 0, 1L)), lit(0L)).as("neg"))
        .collect()
      val found = rows.map { row =>
        row.getString(0) -> ConjStats(base :+ row.getString(0),
          row.getLong(1), row.getLong(2), row.getLong(3),
          1.0 - row.getLong(1) / math.max(nComparisons, 1.0))
      }.toMap
      missing.foreach { x =>
        val s = found.getOrElse(x,
          ConjStats(base :+ x, 0L, 0L, 0L, 1.0))
        cache((base :+ x).sorted) = s
      }
      log(s"scored ${missing.size} extensions of [${base.mkString("&")}] " +
        s"in ${math.round((System.nanoTime() - t0) / 1e8) / 10.0} s")
    }
    exts.map(x => x -> cache((base :+ x).sorted)).toMap
  }

  /** Single-conjunction scoring (tests / spot checks). */
  def score(conjunction: Seq[String]): ConjStats =
    scoreBatch(conjunction.init, Seq(conjunction.last))(conjunction.last)

  private def nGramCount(conj: Seq[String]): Int =
    conj.count(_.startsWith("find_ngrams"))

  /** optimizers.py:52-61 `_keep_if`. */
  private def keepIf(s: ConjStats): Boolean =
    s.positives > 0 && s.rr < 1.0 && s.nPairs > 1 &&
      nGramCount(s.conjunction) <= 1

  /** optimizers.py:73-99 `get_best` for one seed scheme, reusing the
    * batched singles map. */
  private def getBestFrom(seed: String, singles: Map[String, ConjStats]): Seq[ConjStats] = {
    val dp = mutable.ArrayBuffer.empty[ConjStats]
    val s0 = singles(seed)
    if (s0.positives == 0 || s0.rr < seedRrCut) return Nil
    dp += s0
    var n = 1
    var done = false
    while (n < k && !done) {
      val base = dp(n - 1).conjunction
      val extNames = schemes.map(_.name)
        .filterNot(base.contains)
        .filter(x => nGramCount(base :+ x) <= 1) // prune pre-score; same kept set
      val candidates = scoreBatch(base, extNames).values.filter(keepIf)
      if (candidates.isEmpty) done = true
      else {
        dp += candidates.maxBy(_.key)
        n += 1
      }
    }
    dp.toSeq
  }

  def getBest(seed: String): Seq[ConjStats] =
    getBestFrom(seed, scoreBatch(Nil, schemes.map(_.name)))

  /** learner.py:51-67 `conjunctions_list`: DP from every seed, flatten,
    * dedupe, sort desc by (rr, positives, −negatives).
    */
  def learn(): Seq[ConjStats] = {
    val singles = scoreBatch(Nil, schemes.map(_.name))
    schemes.map(_.name)
      .flatMap(s => getBestFrom(s, singles))
      .distinctBy(_.conjunction.sorted)
      .sortBy(_.key)(Ordering[(Double, Long, Long)].reverse)
  }

  def boundConjunction(names: Seq[String]): Seq[BoundScheme] =
    names.map(byName)

  def unpersist(): Unit = {
    trainCached.unpersist(); labelsCached.unpersist()
  }
}

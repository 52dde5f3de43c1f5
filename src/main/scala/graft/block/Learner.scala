package graft.block

import org.apache.spark.sql.{Column, DataFrame}
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
  * here every DP step scores ALL extensions of a base in one batch:
  * the per-extension inverted indexes are unioned under a `_x` tag
  * column and aggregated grouped by tag (J3+A1 batched) — see
  * [[scoreBatch]] for the block-size/coverage split that keeps the
  * whole search O(k × #seeds-passing) batches with no pair-scale
  * work. Scores are memoized across seeds (reference @lru_cache,
  * optimizers.py:37-50).
  */
/** Conjunction statistics are evaluated on the FULL `records` corpus,
  * not a train sample — a deliberate divergence from the reference's
  * sample-table estimator (db/postgres/initialize.py train table) and
  * the Spark-first answer to a bias a sample CANNOT fix: blocking is
  * frequency-capped, and pair structure shrinks quadratically under
  * record sampling, so a scheme whose keys are hot at corpus scale but
  * cool in an m-of-n sample (a short prefix over a growing key domain)
  * looks high-coverage in-sample and then loses all its blocks to the
  * cap at full scale (measured here: blocking recall 1.0 → 0.2 at
  * sf0.1 from a 4.8k-of-162k sample; re-scaling the cap to m/n just
  * trades the bias for noise — surviving sample blocks of size ≤ 3
  * score rr ≈ 1 on luck).
  *
  * Evaluating full-corpus stats WITHOUT the quadratic self-join:
  *   - `n_pairs` = Σ_blocks C(size, 2) over cap-surviving blocks —
  *     computed from BLOCK SIZES (one groupBy per batch, map-side
  *     partial agg), never materializing a pair. For multi-key (n-gram)
  *     schemes this counts a pair once per shared key — an upper bound
  *     that is exactly the JOIN WORK the conjunction induces, which is
  *     what the reduction ratio guards.
  *   - `positives`/`negatives` = labeled pairs whose two sides share a
  *     cap-surviving key — a join against the LABELED records only
  *     (thousands of rows however large the corpus).
  */
final class Learner(
    records: DataFrame,
    labels: DataFrame,
    attrs: Seq[String],
    k: Int = 3,
    seedRrCut: Double = 0.99,
    maxBlockSize: Int = Blocking.DefaultMaxBlockSize,
    idCol: String = "conv_id",
    maxCompare: Long = 1000000L,
    dpParallelism: Int = Learner.DefaultDpParallelism) {

  val schemes: Seq[BoundScheme] = Schemes.forAttributes(attrs)
  private val byName: Map[String, BoundScheme] =
    schemes.map(b => b.name -> b).toMap
  // memoized conjunction stats, keyed by the SORTED scheme list.
  // ConcurrentHashMaps because seed DP chains run on parallel threads
  // ([[learnFrom]]): `inflight` is the claim map — chains CONVERGING
  // on the same base (seed A's argmax is B and vice versa) is
  // structurally common, not a same-instant rarity, and without a
  // claim each converged chain would re-run the full corpus-scale
  // stats batch for the same conjunctions. The first thread to claim
  // a key computes it; others await the winner's latch and read the
  // cache ([[scoreBatch]]).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], ConjStats]
  private[block] val inflight =
    new java.util.concurrent.ConcurrentHashMap[
      Seq[String], java.util.concurrent.CountDownLatch]

  private val labelsCached = labels.cache()

  private def sigColName(scheme: String): String = s"_s_$scheme"

  /** Forward SIGNATURE table: idCol + one validated signature column
    * per scheme, every column an array<string> (scalar schemes become
    * 1-element arrays; array schemes are deduped map-side and cleared
    * of null/"" exactly as [[Blocking.invertedIndex]] filters them).
    * Computed and cached ONCE — the expensive part of every DP batch
    * (regex tokenization, n-gram generation over text attributes) runs
    * one time per record instead of once per batch per record.
    */
  private def sigTable(df: DataFrame): DataFrame =
    df.select((col(idCol) +: schemes.map { b =>
      val e = b.scheme.expr(b.attr)
      val c =
        if (b.isArray)
          filter(array_distinct(e), s => s.isNotNull && s =!= "")
        else
          when(e.isNotNull && e =!= "", array(e))
            .otherwise(array().cast("array<string>"))
      c.as(sigColName(b.name))
    }): _*)

  private val corpusSigs = sigTable(records).cache()
  // labeled-record slice of the corpus — both ends of every labeled
  // pair; tiny next to the corpus, cached for the coverage joins.
  // Semi-joined off the CACHED signature table so the tokenization /
  // n-gram expressions never run a second time over records.
  private val labRecSigs = {
    val ids = labels.select(col("id_l").as(idCol))
      .unionByName(labels.select(col("id_r").as(idCol))).distinct()
    corpusSigs.join(ids, Seq(idCol), "left_semi").cache()
  }
  private lazy val nComparisons: Double = {
    val n = corpusSigs.count().toDouble
    n * (n - 1) / 2.0
  }

  /** Per-row array of 64-bit hashes of the base-conjunction signature
    * tuples — the cartesian product of the base schemes' per-record
    * signature sets, hash-chained left to right (block statistics need
    * key IDENTITY, not key text; a 64-bit collision merges two blocks
    * in the estimate with probability ~#blocks²/2⁶⁴ — statistical
    * zero). Empty array ⇔ some base scheme has no valid signature ⇔
    * the record is in no block of this conjunction.
    */
  private def combosCol(base: Seq[String]): Column =
    base.foldLeft(array(lit(0L))) { (acc, name) =>
      flatten(transform(acc, h =>
        transform(col(sigColName(name)), s => xxhash64(h, s))))
    }

  /** (tag, block-key-hash) incidence rows for `base ∧ x` over every x,
    * one per (record, extension, compound signature) — produced by a
    * PURE PROJECTION over the cached signature table: no join anywhere,
    * so the only shuffle a stats batch ever does is the partial-agg
    * groupBy on the emitted key. The extension tag is the INT index
    * into `exts` (callers map back by position), not the scheme-name
    * string: the tag rides every incidence row through the batch
    * shuffle, and a 4-byte int vs a ~25-byte name is a third off the
    * shuffled row (guide §2.3, narrower types).
    */
  private def keyedRows(sigs: DataFrame, base: Seq[String],
                        exts: Seq[String], keep: Seq[Column]): DataFrame = {
    val extArr = array(exts.zipWithIndex.map { case (x, i) =>
      struct(lit(i).as("_x"), col(sigColName(x)).as("sigs")) }: _*)
    sigs
      .select((keep :+ combosCol(base).as("_bc")) :+
        explode(extArr).as("_e"): _*)
      // the key list is computed as a PLAIN column between the two
      // generators: an explode whose child dereferences the previous
      // explode's struct inside nested lambdas trips Catalyst's
      // attribute binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
      .select((keep :+ col("_e._x").as("_x")) :+
        flatten(transform(col("_bc"), h =>
          transform(col("_e.sigs"), s => xxhash64(h, s)))).as("_ks"): _*)
      .select((keep :+ col("_x")) :+ explode(col("_ks")).as("sigh"): _*)
  }

  /** The surviving-block-size relation for one stats batch — exposed
    * package-private so PlanAuditSpec can pin its shape (no Join, no
    * Window anywhere: [[keyedRows]] is a pure projection and this adds
    * one grouped count).
    *
    * `_n > 1`: singleton blocks are dropped before the persist — they
    * contribute C(1,2) = 0 pairs, and a labeled pair BOTH of whose
    * ends emit a key makes that key's global size ≥ 2, so no coverage
    * can hide in a singleton. With n-gram schemes most compound keys
    * are singletons; this shrinks the spilled block table by roughly
    * that fraction.
    */
  private[graft] def statsPlan(base: Seq[String], exts: Seq[String]): DataFrame =
    keyedRows(corpusSigs, base, exts, Nil)
      .groupBy(col("_x"), col("sigh"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1 && col("_n") <= maxBlockSize)

  /** Optional progress logging (-Dgraft.verbose=true or GRAFT_VERBOSE=1). */
  private val verbose = sys.props.get("graft.verbose").contains("true") ||
    sys.env.get("GRAFT_VERBOSE").contains("1")
  private def log(msg: => String): Unit =
    if (verbose) System.err.println(s"[learner] $msg")

  /** Score `base ∧ x` for every x in `exts` — two Spark jobs total.
    *
    * Shape: ONE map-only pass over the cached signature table emits
    * (tag, block-key-hash) incidence rows for every extension at once
    * ([[keyedRows]] — no corpus-scale join anywhere), then (1) a
    * grouped count turns them into BLOCK SIZES — n_pairs is
    * Σ C(size,2) over cap-surviving blocks, no pair ever materialized —
    * and (2) the labeled-record slice's keys are semi-joined against
    * the surviving blocks to count covered labeled pairs. One
    * corpus-scale shuffle per DP step regardless of extension count,
    * with map-side partial aggregation; nothing scales with the pair
    * count.
    */
  def scoreBatch(base: Seq[String], exts: Seq[String]): Map[String, ConjStats] = {
    // claim the uncached keys: compute only the ones this thread wins;
    // await the in-flight winner for the rest (see `inflight` above)
    val claimed = mutable.ArrayBuffer.empty[String]
    val awaited =
      mutable.ArrayBuffer.empty[(String, java.util.concurrent.CountDownLatch)]
    exts.foreach { x =>
      val k = (base :+ x).sorted
      if (!cache.containsKey(k)) {
        val latch = new java.util.concurrent.CountDownLatch(1)
        val prev = inflight.putIfAbsent(k, latch)
        if (prev == null) claimed += x else awaited += ((x, prev))
      }
    }
    val missing = claimed.toSeq
    val t0 = System.nanoTime()
    try if (missing.nonEmpty) {
      val keyCols = Seq("_x", "sigh")
      // block SIZES on the full corpus — a plain groupBy with map-side
      // partial aggregation over map-only incidence rows; the cap is
      // applied to the real sizes, exactly as candidatePairs will apply
      // it at blocking time.
      // read twice (n_pairs agg + coverage semi-join) → persisted.
      // MEMORY_AND_DISK (columnar, evictable, lineage kept): the
      // surviving-block table can be tens of millions of rows per
      // batch — an un-evictable localCheckpoint OOMed the 8 GB test
      // JVM, and the round-5 DISK_ONLY answer paid a full disk
      // write+read per DP batch even when the table fit in memory;
      // a plain cache spills under pressure instead of pinning.
      val surviving = statsPlan(base, missing)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairsPlan = surviving.groupBy(col("_x"))
        .agg(sum(col("_n") * (col("_n") - 1) / 2).cast("long").as("n"))
      // the n_pairs aggregation and the coverage arm are independent
      // reads of `surviving` — run them as two CONCURRENT jobs (guide
      // §2.6: actions are only sequential because the driver calls
      // them sequentially); the second job's tasks backfill the
      // first's barrier tail. Concurrent first-materialization of the
      // cache is safe (per-partition cache locks: one task computes,
      // the other waits).
      val nPairsFut = scala.concurrent.Future(
        nPairsPlan.collect().map(r => missing(r.getInt(0)) -> r.getLong(1))
          .toMap
      )(Learner.batchEc)
      // labeled-pair coverage: both ends share a cap-surviving key —
      // joins touch only the labeled-record slice, never the corpus.
      // The cap-survivor lookup is a DOUBLE BROADCAST semi-join
      // (guide §3.2 shape): the labeled slice's distinct keys prune
      // `surviving` map-side (no sort, no exchange of the big table),
      // and the surviving subset — bounded by the labeled key count —
      // broadcasts back against the labeled incidence rows.
      val labKeys = keyedRows(labRecSigs, base, missing, Nil).distinct()
      val survKeys = surviving.select(keyCols.map(col): _*)
        .join(broadcast(labKeys), keyCols, "left_semi")
      val labSigs = keyedRows(labRecSigs, base, missing, Seq(col(idCol)))
        .join(broadcast(survKeys), keyCols, "left_semi")
      val l = labSigs.select((col(idCol).as("id_l") +: keyCols.map(col)): _*)
      val r = labSigs.select((col(idCol).as("id_r") +: keyCols.map(col)): _*)
      val covRows = labelsCached
        .join(l, "id_l")
        .join(r, ("id_r" +: keyCols))
        .select("_x", "id_l", "id_r", "label").distinct()
        .groupBy(col("_x"))
        .agg(
          coalesce(sum(when(col("label") === 1, 1L)), lit(0L)).as("pos"),
          coalesce(sum(when(col("label") === 0, 1L)), lit(0L)).as("neg"))
        .collect().map(r => missing(r.getInt(0)) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val nPairsRows = scala.concurrent.Await.result(nPairsFut,
        scala.concurrent.duration.Duration.Inf)
      surviving.unpersist()
      val found = missing.flatMap { x =>
        nPairsRows.get(x).map { n =>
          val (pos, neg) = covRows.getOrElse(x, (0L, 0L))
          x -> ConjStats(base :+ x, n, pos, neg,
            1.0 - n / math.max(nComparisons, 1.0))
        }
      }.toMap
      missing.foreach { x =>
        val s = found.getOrElse(x,
          ConjStats(base :+ x, 0L, 0L, 0L, 1.0))
        cache.put((base :+ x).sorted, s)
      }
      log(s"scored ${missing.size} extensions of [${base.mkString("&")}] " +
        s"in ${math.round((System.nanoTime() - t0) / 1e8) / 10.0} s")
    }
    finally missing.foreach { x => // release claims even on failure —
      // an un-counted latch would hang every waiter forever
      Option(inflight.remove((base :+ x).sorted)).foreach(_.countDown())
    }
    awaited.foreach(_._2.await())
    // a winner that failed leaves its key uncached — reclaim and
    // recompute locally (the winner's own exception is already
    // propagating up its chain)
    val orphaned = awaited.map(_._1)
      .filterNot(x => cache.containsKey((base :+ x).sorted))
    if (orphaned.nonEmpty) scoreBatch(base, orphaned.toSeq)
    // return the CALLER's path order, not whichever chain populated the
    // cache first: stats live under the sorted key, but the conjunction
    // Seq a chain sees must be its own `base :+ x` — otherwise two
    // chains converging on one scheme set would hand out the first
    // computer's ordering, making the learned list depend on chain
    // completion order under [[learnFrom]]'s parallelism
    exts.map { x =>
      val s = cache.get((base :+ x).sorted)
      x -> s.copy(conjunction = base :+ x)
    }.toMap
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
  /** The min_rr refusal threshold the budget loop will apply —
    * `1 − maxCompare / C(n,2)` over the SAME corpus the stats are
    * computed on ([[graft.pipeline.Dedupe.applicableConjunctions]],
    * reference db/postgres/blocking.py:74-86).
    */
  def budgetMinRr: Double = 1.0 - maxCompare / math.max(nComparisons, 1.0)

  /** Which passing seeds the DP refines EAGERLY — derived from the
    * BUDGET MATH, not a rank count: the seeds whose own depth-1 rr
    * already clears the min_rr/max_compare refusal. Their refinements
    * sort above them (higher rr) and cover positives at a lower
    * pair-per-positive cost, which is exactly where the best-first
    * nCovered budget bites — while coverage itself is safe regardless,
    * because the admitted seed (applied later in the same prefix)
    * blocks a SUPERSET of every refinement's pairs. Each skipped
    * below-cutoff seed saves k−1 corpus-scale stats batches; skipped
    * seeds keep their depth-1 stats in the learned list, so the budget
    * loop still sees (and refuses) them.
    *
    * What the skip assumes — and what guards it: rr is MONOTONE under
    * refinement (`seed ∧ x` blocks a subset of the seed's pairs, so
    * rr(seed ∧ x) ≥ rr(seed)), which means a below-cutoff seed's
    * refinement CAN clear the cutoff and enter the applied prefix —
    * the reference, which extends every seed (optimizers.py:73-99),
    * would learn it. Such a refinement only MATTERS when it covers a
    * duplicate pair nothing admitted covers, and that is checkable
    * exactly against the labels: [[learn]] verifies the admitted
    * prefix's label coverage after the primary pass and escalates to
    * refining EVERY passing seed (full reference semantics,
    * cache-incremental) if a labeled positive would otherwise be
    * lost. The guard is exactly as strong as the labels — the same
    * evidence the reference's own conjunction search runs on.
    */
  private[graft] def refinableSeeds(singles: Map[String, ConjStats]): Seq[String] = {
    val minRr = budgetMinRr
    schemes.map(_.name)
      .filter { s =>
        val st = singles(s); st.positives > 0 && st.rr >= seedRrCut
      }
      .filter(s => singles(s).rr >= minRr)
      .sortBy(s => singles(s).key)(Ordering[(Double, Long, Long)].reverse)
  }

  /** Distinct labeled POSITIVE pairs covered by ANY of `conjs` (both
    * ends share a cap-surviving compound key of some conjunction) —
    * the union counterpart of [[scoreBatch]]'s per-conjunction
    * coverage arm, same scale shape: one map-only incidence pass over
    * each cached signature table, one grouped count for the
    * cap-surviving blocks, coverage joins on the labeled slice only.
    * Feeds [[learn]]'s escalation guard; oracle-checked as
    * q60_coverage_guard.
    */
  def coveredPairs(conjs: Seq[Seq[String]]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    if (conjs.isEmpty)
      return Seq.empty[(String, String)].toDF("id_l", "id_r")
    val arr = array(conjs.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("_x"), combosCol(c).as("_ks")) }: _*)
    def rows(sigs: DataFrame, keep: Seq[Column]) = sigs
      .select(keep :+ explode(arr).as("_e"): _*)
      .select((keep :+ col("_e._x").as("_x")) :+
        explode(col("_e._ks")).as("sigh"): _*)
    val keyCols = Seq("_x", "sigh")
    val surviving = rows(corpusSigs, Nil)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1 && col("_n") <= maxBlockSize)
    // same double-broadcast semi shape as [[scoreBatch]]'s coverage arm:
    // prune the corpus-scale survivor table map-side with the labeled
    // slice's distinct keys, then broadcast the (labeled-key-bounded)
    // survivor subset back — no sort or exchange of the big table
    val labKeys = rows(labRecSigs, Nil).distinct()
    val survKeys = surviving.select(keyCols.map(col): _*)
      .join(broadcast(labKeys), keyCols, "left_semi")
    val labSigs = rows(labRecSigs, Seq(col(idCol)))
      .join(broadcast(survKeys), keyCols, "left_semi")
    val l = labSigs.select(col(idCol).as("id_l") +: keyCols.map(col): _*)
    val r = labSigs.select(col(idCol).as("id_r") +: keyCols.map(col): _*)
    labelsCached.filter(col("label") === 1)
      .join(l, "id_l")
      .join(r, "id_r" +: keyCols)
      .select("id_l", "id_r").distinct()
  }

  private[graft] def coveredPositives(conjs: Seq[Seq[String]]): Long =
    coveredPairs(conjs).count()

  def learn(): Seq[ConjStats] = {
    val singles = scoreBatch(Nil, schemes.map(_.name))
    // refine only the seeds the budget math says can matter (see
    // [[refinableSeeds]]); the rest stay as their depth-1 selves.
    // (The reference extends EVERY seed — one postgres query per
    // candidate from a process pool, optimizers.py:73-99; at Spark
    // batch costs a below-cutoff seed's refinements are corpus-scale
    // work for conjunctions the budget loop usually refuses.)
    val passing = schemes.map(_.name).filter { s =>
      val st = singles(s); st.positives > 0 && st.rr >= seedRrCut
    }
    val primary = refinableSeeds(singles)
    val learned = learnFrom(primary, singles)
    if (passing.size == primary.size) return learned
    // COVERAGE GUARD for the skipped (below-cutoff) seeds: if the
    // would-be admitted prefix (the same takeWhile
    // [[graft.pipeline.Dedupe.applicableConjunctions]] applies)
    // already covers every labeled positive, skipped refinements
    // cannot add coverage — the skip is proven safe against the
    // labels. Otherwise fall back to the reference's full semantics.
    // Common-case cost: ZERO extra Spark jobs beyond one tiny labels
    // count — a single admitted conjunction covering all positives
    // short-circuits the union batch.
    val admitted = learned.takeWhile(_.rr >= budgetMinRr)
    val totalPos = labelsCached.filter(col("label") === 1)
      .select("id_l", "id_r").distinct().count()
    val gapFree = totalPos == 0L ||
      admitted.exists(_.positives == totalPos) ||
      coveredPositives(admitted.map(_.conjunction)) == totalPos
    if (gapFree) learned
    else {
      log(s"labeled positives uncovered behind the admitted prefix — " +
        s"escalating to full DP over all ${passing.size} passing seeds")
      learnFrom(passing, singles)
    }
  }

  /** DP from an explicit seed set (package-private so the seed-budget
    * A/B tool and specs can compare selection policies on one shared
    * stats cache).
    *
    * Seed chains run on `dpParallelism` driver threads: each seed's DP
    * is sequential in DEPTH (depth n+1 extends depth n's argmax), but
    * different seeds' chains are independent, and at bench scale each
    * stats batch is barrier-bound (sub-second tasks behind a driver
    * collect), so overlapping the chains hides the job-scheduling
    * latency that otherwise dominates the learner stage. Spark job
    * submission is thread-safe; the stats cache is concurrent; results
    * are awaited IN SEED ORDER and both `distinctBy` (keeps first) and
    * `sortBy` (stable) preserve it, so the learned list is bit-identical
    * to the sequential one at any parallelism. */
  private[graft] def learnFrom(extendSeeds: Seq[String],
                               singles: Map[String, ConjStats]): Seq[ConjStats] = {
    val passing = schemes.map(_.name).filter { s =>
      val st = singles(s); st.positives > 0 && st.rr >= seedRrCut
    }
    val rest = passing.filterNot(extendSeeds.contains)
    val par = math.max(1, math.min(dpParallelism, extendSeeds.size))
    val chains: Seq[Seq[ConjStats]] =
      if (par <= 1) extendSeeds.map(s => getBestFrom(s, singles))
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        try Await.result(
          Future.sequence(extendSeeds.map(s =>
            Future(getBestFrom(s, singles)))), Duration.Inf)
        finally pool.shutdown()
      }
    (chains.flatten ++ rest.map(singles))
      .distinctBy(_.conjunction.sorted)
      .sortBy(_.key)(Ordering[(Double, Long, Long)].reverse)
  }

  def boundConjunction(names: Seq[String]): Seq[BoundScheme] =
    names.map(byName)

  def unpersist(): Unit = {
    corpusSigs.unpersist(); labelsCached.unpersist()
    labRecSigs.unpersist(); ()
  }
}

object Learner {
  /** Shared pool for the per-batch concurrent n_pairs collect — daemon
    * threads so a crashed driver never hangs on pool shutdown; sized
    * 2× the chain default (each chain holds at most one in-flight
    * batch, each batch at most one future). */
  private[block] val batchEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "learner-batch-collect")
        t.setDaemon(true)
        t
      }))

  /** Same pool, exposed for the pipeline's cache-prewarm overlap
    * ([[graft.pipeline.Dedupe.run]]). */
  private[graft] def prewarmEc: scala.concurrent.ExecutionContext = batchEc

  /** Concurrent seed DP chains (an execution knob, NOT part of the
    * learned-output semantics — the result is bit-identical at any
    * value, so it deliberately stays OUT of the `conjunctions` stage
    * identity). 4 overlaps enough collect barriers to hide scheduling
    * latency without stacking 4 corpus-scale DISK_ONLY block tables of
    * doubtful co-residency on the executor spill volume; 8 measured NO
    * faster at sf0.1 (72.9 s vs 74.5 s for the conjunctions stage) —
    * past 4 chains the batches contend for cores, not barriers. */
  final val DefaultDpParallelism: Int = 4
}

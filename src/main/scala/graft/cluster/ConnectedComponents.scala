package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge DataFrame — replaces
  * the reference's driver-memory networkx clustering
  * (oagdedupe cluster/cluster.py:45-81), which cannot hold 10^10-node
  * graphs.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) expressed
  * as DataFrame self-joins + aggregations:
  *
  *   large-star: every node points its LARGER neighbors at the minimum
  *               of its neighborhood (incl. itself);
  *   small-star: every node points its smaller neighbors (and itself)
  *               at the minimum of its smaller neighborhood.
  *
  * Converges in O(log n) rounds; each round is two shuffles on node id.
  * Per-superstep the edge set is localCheckpoint'ed (lineage cut —
  * iterative joins otherwise stack exponentially growing plans) and
  * convergence is detected by an order-insensitive (count, xor-of-hash)
  * fingerprint — one tiny agg per round, the "convergence checkpointed
  * per superstep" demanded by the north rule.
  */
object ConnectedComponents {

  final case class Superstep(round: Int, edges: Long, fingerprint: Long)

  /** @param edges DataFrame with columns (id_l, id_r); ids any orderable
    *              atomic type (string conv_ids or long indices).
    * @param reliableCheckpoints per-superstep materialization strategy:
    *              false (default) = `localCheckpoint` — executor-storage
    *              pinned, right for a single JVM; true = reliable
    *              `checkpoint()` to the SparkContext's checkpoint dir
    *              (caller must `setCheckpointDir`) — survives executor
    *              loss, the cluster-grade choice under dynamic
    *              allocation.
    * @return (id, component) where component = min member id, plus the
    *         supersteps metric trail.
    */
  /** Target edges per shuffle partition during the iteration. Each
    * superstep is ~6 exchanges; sizing partitions to the LIVE edge
    * count (known free from the convergence fingerprint) keeps a
    * 10^10-edge graph at thousands of partitions while a thresholded
    * 10^4-edge graph collapses to a handful — without this, a small
    * graph pays cpus×4 near-empty tasks per exchange per round, and
    * scheduling overhead DOMINATES (measured: q13 at sf0.1 took 46 s
    * at local[32]/128 partitions vs 19 s at local[8]/32 — more cores
    * made it slower). */
  val EdgesPerPartition = 200000L

  /** Edge count above which STRING node ids are dictionary-encoded to
    * dense longs before the superstep loop. Every superstep is ~6
    * exchanges keyed on node id over O(log n) rounds — long keys cut
    * shuffle bytes and comparator cost — but the encode itself is a
    * fixed ~5 jobs + 4 joins (distinct, range-sort, zipWithIndex,
    * encode ×2, decode ×2): measured +3.4 s on a 15k-edge graph whose
    * whole CC takes 4 s. Below this threshold the loop runs directly
    * on strings; above it the superstep shuffles dwarf the encode. */
  val EncodeEdgeThreshold = 1000000L

  def run(edges: DataFrame, maxRounds: Int = 50,
          reliableCheckpoints: Boolean = false,
          encodeThreshold: Long = EncodeEdgeThreshold)
      : (DataFrame, Seq[Superstep]) = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = edges.sparkSession
    // LAZY checkpoints: every materialized edge set is immediately
    // fingerprinted, and that aggregation is the action that computes
    // the checkpoint — one job per superstep instead of two (the eager
    // form ran a materialization job AND the fingerprint job per round;
    // at converged-small edge counts the loop is pure job/barrier
    // overhead, measured 3.2 s for a 15k-edge graph at local[32]).
    def materialize(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    // normalize once: undirected, canonical a<b, deduped — materialized
    // because the loop (and the encode decision) scans it repeatedly
    val e0 = materialize(edges
      .select(col("id_l").as("a"), col("id_r").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct())
    val fp0 = fingerprint(e0)
    val stringIds = edges.schema("id_l").dataType == StringType
    if (!stringIds || fp0._1 <= encodeThreshold)
      return loop(e0, fp0, maxRounds, reliableCheckpoints)
    // Dictionary-encode (see EncodeEdgeThreshold). ORDER-PRESERVING:
    // ids assigned by zipWithIndex over range-sorted distinct ids, so
    // min-over-idx ≡ min-over-id, the canonical a<b orientation
    // survives encoding, and the decoded component is the same min
    // member id the string-keyed run produces.
    val nodes = e0.select(col("a").as("id"))
      .unionByName(e0.select(col("b").as("id")))
      .distinct()
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
    val dictSchema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("idx", LongType, nullable = false)))
    val dict0 = spark.createDataFrame(
      nodes.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.getString(0), i)
      }, dictSchema)
    val dict = if (reliableCheckpoints) dict0.checkpoint()
               else dict0.localCheckpoint()
    val encoded = materialize(e0
      .join(dict.select(col("id").as("a"), col("idx").as("_ea")), "a")
      .join(dict.select(col("id").as("b"), col("idx").as("_eb")), "b")
      .select(col("_ea").as("a"), col("_eb").as("b")))
    val (members, steps) = loop(encoded, fingerprint(encoded), maxRounds,
      reliableCheckpoints)
    val decoded = members
      .join(dict.select(col("idx").as("id"), col("id").as("_sid")), "id")
      .join(dict.select(col("idx").as("component"), col("id").as("_scomp")),
        "component")
      .select(col("_sid").as("id"), col("_scomp").as("component"))
    (decoded, steps)
  }

  /** The alternating large-star/small-star loop over a normalized
    * (undirected, canonical, deduped, materialized) edge set. */
  private def loop(e0: DataFrame, fp0: (Long, Long), maxRounds: Int,
          reliableCheckpoints: Boolean): (DataFrame, Seq[Superstep]) = {
    val spark = e0.sparkSession
    def materialize(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint() else df.localCheckpoint()
    var e = e0
    val steps = scala.collection.mutable.ArrayBuffer.empty[Superstep]
    var fp = fp0
    steps += Superstep(0, fp._1, fp._2)
    // adapt shuffle width to the live edge count per round (restored
    // after the loop, exception-safe via finally). NOTE: the setting is
    // SESSION-scoped — a concurrent query on the same SparkSession (or
    // two concurrent CC runs) would observe the shrunken width; this
    // engine's one-driver pipeline runs CC serially, so the assumption
    // holds. A multi-tenant session should run CC through
    // `spark.newSession()` (separate conf, shared catalog/cache).
    val confKey = "spark.sql.shuffle.partitions"
    val outerPartitions = spark.conf.get(confKey)
    def adapt(edgeCount: Long): Unit = spark.conf.set(confKey,
      math.max(1L, math.min(outerPartitions.toLong,
        edgeCount / EdgesPerPartition + 1)).toString)
    var round = 0
    var converged = false
    try {
      while (!converged && round < maxRounds) {
        round += 1
        adapt(fp._1)
        val next = materialize(smallStar(largeStar(e)))
        val nfp = fingerprint(next)
        converged = nfp == fp
        fp = nfp
        e = next
        steps += Superstep(round, fp._1, fp._2)
      }
    } finally spark.conf.set(confKey, outerPartitions)
    require(converged, s"CC did not converge in $maxRounds rounds")

    // converged edge set is a star: (member, root). Roots appear only on
    // the right; add them as their own component members.
    val members = e.select(col("b").as("id"), col("b").as("component"))
      .unionByName(e.select(col("a").as("id"), col("b").as("component")))
      .distinct()
    (members, steps.toSeq)
  }

  /** Large-star: for each node u, link every strictly larger neighbor to
    * min(N(u) ∪ u). Output is NOT deduped here: the only consumer is
    * [[smallStar]], whose orientation step starts with a `distinct()`
    * and whose min-aggregation is duplicate-insensitive — the former
    * trailing `distinct()` was a full extra exchange per superstep for
    * rows the next operator dedupes anyway (guide §2.4).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    // one explicit exchange on the star key: the min-aggregation AND
    // the sym⋈m join both cluster by `a`, so hash-partitioning sym once
    // serves both (guide §2.4 "two operations keyed the same way can
    // share one exchange"; the repartition subtree is identical in both
    // consumers, so ReuseExchange shuffles it once)
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))
    val m = sym.groupBy(col("a"))
      .agg(min(col("b")).as("_mn"))
      .select(col("a"), least(col("a"), col("_mn")).as("m"))
    sym.join(m, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
  }

  /** Small-star: orient edges large→small; link all smaller neighbors
    * (and u itself) to the minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    // same shared-exchange shape as [[largeStar]]: partitioning by `u`
    // satisfies the (u, v) distinct, the min-aggregation and the join,
    // so the orientation shuffles once; the only other exchange is the
    // final (a, b) distinct that the convergence fingerprint requires
    // (the fingerprint is a multiset hash — dup rows would break the
    // converged-set comparison)
    val oriented = e
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .repartition(col("u"))
      .distinct()
    val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    oriented.join(m, "u")
      .select(col("v").as("a"), col("m").as("b"))
      .unionByName(m.select(col("u").as("a"), col("m").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Order-insensitive edge-set fingerprint: (count, xor of row hashes)
    * — collision-safe enough for a convergence check, one aggregation.
    */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("c"),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** DuckDB oracle: transitive-closure min-propagation via recursive CTE
    * over a CTE named `edges(id_l, id_r)` — fine at oracle scale, the
    * Spark path above is the scale path.
    */
  def oracleSql: String =
    """sym AS (
      |  SELECT id_l AS u, id_r AS v FROM edges
      |  UNION SELECT id_r, id_l FROM edges
      |),
      |walk(u, c) AS (
      |  SELECT u, u FROM sym
      |  UNION
      |  SELECT s.u, w.c FROM sym s JOIN walk w ON s.v = w.u
      |)
      |SELECT u AS id, min(c) AS component FROM walk GROUP BY u""".stripMargin
}

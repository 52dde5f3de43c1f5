package graft.block

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.Transcripts

/** Labeled-pair synthesis.
  *
  * Reference semantics (oagdedupe db/postgres/initialize.py:67-135):
  * pos = 1 sampled record repeated 4× → C(4,2) pairs label 1;
  * neg = 10 sampled records → C(10,2) pairs label 0. We reproduce that
  * generator for pipeline use ([[referenceStyle]]), and ALSO derive a
  * deterministic labeled set from the planted duplicates of the
  * transcript corpus ([[plantedLabels]]) — fully SQL-expressible so the
  * DuckDB oracle can check it, and the basis of the pairwise-F1 gate.
  *
  * Planted truth (see graft.synth.Transcripts): conversations c<k> and
  * d<k> are near-duplicates for every order key k % 10 == 0.
  *   - label 1 (train): pairs (c<k>, d<k>) for k % 20 == 0
  *   - label 0 (train): pairs (c<k>, c<k+1>) for k % 20 == 0 (distinct
  *     orders are non-matches), when the neighbor order exists
  *   - evaluation truth: ALL dup pairs (k % 10 == 0)
  */
object Labels {

  /** Order keys that actually produce a conversation (orders with at
    * least one lineitem — an order with no turns has no record).
    */
  private def liveKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"))
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .select(col("o_orderkey").as("k"))
  }

  /** Train labels from planted duplicates (SQL-mirrored). */
  def plantedLabels(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = liveKeys(spark, sfDir)
    val dupKeys = keys.filter(col("k") % 20 === 0)
    val pos = dupKeys.select(
      concat(lit("c"), col("k").cast("string")).as("id_l"),
      concat(lit("d"), col("k").cast("string")).as("id_r"),
      lit(1).as("label"))
    def negShift(shift: Int): DataFrame = dupKeys.as("a")
      .join(keys.as("b"), col("a.k") + shift === col("b.k"))
      .select(
        concat(lit("c"), col("a.k").cast("string")).as("id_l"),
        concat(lit("c"), (col("a.k") + shift).cast("string")).as("id_r"),
        lit(0).as("label"))
    pos.unionByName(negShift(1)).unionByName(negShift(2))
      .select(least(col("id_l"), col("id_r")).as("id_l"),
        greatest(col("id_l"), col("id_r")).as("id_r"), col("label"))
  }

  /** Ground-truth match pairs for evaluation (all planted dups). */
  def truthPairs(spark: SparkSession, sfDir: String): DataFrame =
    liveKeys(spark, sfDir)
      .filter(col("k") % 10 === 0)
      .select(
        concat(lit("c"), col("k").cast("string")).as("id_l"),
        concat(lit("d"), col("k").cast("string")).as("id_r"))

  /** DuckDB SQL equivalent of [[plantedLabels]]. */
  val oracleSelect: String =
    """SELECT least(id_l, id_r) AS id_l, greatest(id_l, id_r) AS id_r, label
      |FROM (
      |  WITH live AS (
      |    SELECT o_orderkey AS k FROM orders
      |    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
      |  )
      |  SELECT 'c' || CAST(k AS VARCHAR) AS id_l,
      |         'd' || CAST(k AS VARCHAR) AS id_r, 1 AS label
      |  FROM live WHERE k % 20 = 0
      |  UNION ALL
      |  SELECT 'c' || CAST(a.k AS VARCHAR),
      |         'c' || CAST(a.k + 1 AS VARCHAR), 0
      |  FROM live a JOIN live b ON a.k + 1 = b.k WHERE a.k % 20 = 0
      |  UNION ALL
      |  SELECT 'c' || CAST(a.k AS VARCHAR),
      |         'c' || CAST(a.k + 2 AS VARCHAR), 0
      |  FROM live a JOIN live b ON a.k + 2 = b.k WHERE a.k % 20 = 0
      |)""".stripMargin

  /** Reference-style label synthesis (initialize.py:67-98): one sampled
    * record is REPLICATED 4× under fresh suffixed ids — exactly the
    * reference's `pd.concat([record] * 4)` with new `_index` values —
    * yielding C(4,2)=6 guaranteed-match label-1 pairs; `nNeg` sampled
    * records → C(nNeg,2) label-0 pairs (distinct records assumed
    * non-matching). Deterministic via seeded md5 ordering.
    *
    * @return (augmented, labels): `augmented` = records ∪ the 4
    *         replicas — the replicas must exist as records for
    *         downstream featurization, just as the reference INSERTs
    *         them into its train table before featurizing.
    */
  def referenceStyle(records: DataFrame, idCol: String = "conv_id",
                     nNeg: Int = 10, seed: Long = 42L): (DataFrame, DataFrame) = {
    def pick(n: Int, salt: String) = records
      .orderBy(md5(concat(lit(s"$seed:$salt:"), col(idCol))), col(idCol))
      .limit(n)
    val replicas = pick(1, "pos")
      .withColumn("_rep", explode(array((1 to 4).map(lit): _*)))
      .withColumn(idCol, concat(col(idCol), lit("#"), col("_rep")))
      .drop("_rep")
    val repIds = replicas.select(col(idCol).as("id"))
    val posPairs = repIds.as("l").join(repIds.as("r"),
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"),
        lit(1).as("label"))
    val negIds = pick(nNeg, "neg").select(col(idCol).as("id"))
    val negPairs = negIds.as("l").join(negIds.as("r"),
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"),
        lit(0).as("label"))
    (records.unionByName(replicas), posPairs.unionByName(negPairs))
  }

  /** O6: annotation events with re-labels — the labeling-service shape
    * (reference labelstudio/lsapi.py:141-153 picks the LATEST annotation
    * per task by update time). Synthesized deterministically from the
    * planted labels: revision 1 is an initial MISLABEL (flipped),
    * revision 2 the correction — so selecting anything but the latest
    * revision visibly corrupts the label set. */
  def annotationEvents(labels: DataFrame): DataFrame =
    labels.select(col("id_l"), col("id_r"),
        (lit(1) - col("label")).as("label"),
        lit(1L).as("created_at"), lit("ann_initial").as("annotator"))
      .unionByName(labels.select(col("id_l"), col("id_r"), col("label"),
        lit(2L).as("created_at"), lit("ann_fix").as("annotator")))

  /** Latest annotation per pair via groupBy + max_by — an ordinary
    * aggregate with map-side partial aggregation, NOT a
    * row_number-over-(pair, created_at desc) window: at a re-label
    * queue's scale the hot pair is one group row per map task, never
    * one giant window partition. created_at is unique per pair by
    * construction (revision counter), so max_by is deterministic. */
  def latestAnnotations(events: DataFrame): DataFrame =
    events.groupBy("id_l", "id_r")
      .agg(max_by(col("label"), col("created_at")).as("label"),
        max(col("created_at")).as("created_at"),
        max_by(col("annotator"), col("created_at")).as("annotator"))

  /** DuckDB mirror of annotationEvents → latestAnnotations over the
    * `labels` CTE. */
  val latestAnnotationsSql: String =
    """SELECT id_l, id_r,
      |  max_by(label, created_at) AS label,
      |  max(created_at) AS created_at,
      |  max_by(annotator, created_at) AS annotator
      |FROM (
      |  SELECT id_l, id_r, 1 - label AS label,
      |         CAST(1 AS BIGINT) AS created_at, 'ann_initial' AS annotator
      |  FROM labels
      |  UNION ALL
      |  SELECT id_l, id_r, label, CAST(2 AS BIGINT), 'ann_fix'
      |  FROM labels
      |)
      |GROUP BY id_l, id_r""".stripMargin

  /** The transcripts+labels oracle preamble shared by downstream ops. */
  def oracleWith(extra: String*): String =
    (Seq("WITH " + Transcripts.oracleCte) ++ extra).mkString(",\n")
}

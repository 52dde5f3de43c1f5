package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic multi-turn transcript corpus, derived purely from the
  * driver-provided TPC-H-ish parquet tables (orders ⋈ lineitem), so the
  * DuckDB oracle can re-derive the exact same table with ANSI SQL.
  *
  * Schema matches BASELINE.json `input_hint`:
  *   (conv_id:string, turn_idx:int, role:string, text:string,
  *    tool:string, ts:timestamp)
  *
  * One conversation per order; one turn per lineitem (ordered by
  * l_linenumber). Every 10th order is re-emitted as a planted
  * NEAR-DUPLICATE conversation (`d<key>` vs `c<key>`) whose turn texts
  * are perturbed by dropping the last 3 characters — ground-truth match
  * pairs are therefore (c<k>, d<k>) for k % 10 == 0.
  *
  * Reference analog: the seeded-Faker fixtures of
  * oagdedupe tests/db/postgres/test_orm_initialize.py (seed 0) — a
  * deterministic corpus with known duplicates.
  */
object Transcripts {

  /** Spark-side derivation. Must stay semantically identical to
    * [[oracleCte]] (the DuckDB SQL) — the driver hash-compares them.
    */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame = {
    val orders   = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

    val base = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(
        concat(lit("c"), col("o_orderkey").cast("string")).as("conv_id"),
        (col("l_linenumber") - lit(1)).as("turn_idx"),
        when(col("l_linenumber") % 3 === 1, lit("user"))
          .when(col("l_linenumber") % 3 === 2, lit("assistant"))
          .otherwise(lit("tool")).as("role"),
        concat(
          lit("i"), col("l_partkey").cast("string"),
          lit(" s"), col("l_suppkey").cast("string"),
          lit(" q"), col("l_quantity").cast("long").cast("string"),
          lit(" o"), col("o_orderkey").cast("string"),
          lit(" "), col("l_returnflag"), col("l_linestatus"),
          lit(" p"), col("o_orderpriority")).as("text"),
        when(col("l_linenumber") % 3 === 0,
          concat(lit("t"), (col("l_suppkey") % 7).cast("string")))
          .otherwise(lit("")).as("tool"),
        col("l_shipdate").as("ts"),
        col("o_orderkey").as("_okey"))

    val dups = base
      .filter(col("_okey") % 10 === 0)
      .select(
        concat(lit("d"), col("_okey").cast("string")).as("conv_id"),
        col("turn_idx"), col("role"),
        // perturbation: drop last 3 chars (keeps JW similarity high,
        // breaks exact / last_nchars equality)
        col("text").substr(lit(1), length(col("text")) - 3).as("text"),
        col("tool"), col("ts"), col("_okey"))

    base.unionByName(dups).drop("_okey")
  }

  /** DuckDB CTE producing the identical table; prepended to every
    * transcript-based oracle query as `WITH transcripts AS (...)`.
    */
  val oracleCte: String =
    """transcripts AS (
      |  WITH base AS (
      |    SELECT 'c' || CAST(o_orderkey AS VARCHAR) AS conv_id,
      |           l_linenumber - 1 AS turn_idx,
      |           CASE l_linenumber % 3 WHEN 1 THEN 'user'
      |                WHEN 2 THEN 'assistant' ELSE 'tool' END AS role,
      |           'i' || CAST(l_partkey AS VARCHAR)
      |             || ' s' || CAST(l_suppkey AS VARCHAR)
      |             || ' q' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
      |             || ' o' || CAST(o_orderkey AS VARCHAR)
      |             || ' ' || l_returnflag || l_linestatus
      |             || ' p' || o_orderpriority AS text,
      |           CASE WHEN l_linenumber % 3 = 0
      |                THEN 't' || CAST(l_suppkey % 7 AS VARCHAR)
      |                ELSE '' END AS tool,
      |           l_shipdate AS ts,
      |           o_orderkey AS _okey
      |    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  )
      |  SELECT conv_id, turn_idx, role, text, tool, ts FROM base
      |  UNION ALL
      |  SELECT 'd' || CAST(_okey AS VARCHAR), turn_idx, role,
      |         substring(text, 1, length(text) - 3), tool, ts
      |  FROM base WHERE _okey % 10 = 0
      |)""".stripMargin
}

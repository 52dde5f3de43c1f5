package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic multi-turn transcript corpus, derived purely from the
  * driver-provided TPC-H-ish parquet tables (orders ⋈ lineitem), so the
  * DuckDB oracle can re-derive the exact same table with ANSI SQL.
  *
  * Schema matches BASELINE.json `input_hint`:
  *   (conv_id:string, turn_idx:int, role:string, text:string,
  *    tool:string, ts:timestamp)
  *
  * One conversation per order; one turn per lineitem. `turn_idx` is a
  * dense 0-based row_number over the deterministic total order
  * (l_linenumber, l_partkey, l_suppkey) — l_linenumber alone is NOT
  * unique in this synthetic data, and a non-total order would make
  * "stable turn ordering" engine-dependent. Turn text embeds the order
  * key (a session id), making conversations textually unique.
  *
  * Every 10th order is re-emitted as a planted NEAR-DUPLICATE
  * conversation (`d<key>` vs `c<key>`) whose turn texts are perturbed by
  * dropping the last 3 characters — ground-truth match pairs are
  * therefore (c<k>, d<k>) for k % 10 == 0.
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

    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))

    // ONE scan+join+window; the planted duplicates come from an
    // explode of a ['c'] / ['c','d'] tag array rather than a union that
    // would recompute the whole subtree twice (observed in .explain)
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        col("turn_idx"),
        when(col("turn_idx") % 3 === 0, lit("user"))
          .when(col("turn_idx") % 3 === 1, lit("assistant"))
          .otherwise(lit("tool")).as("role"),
        concat(
          lit("i"), col("l_partkey").cast("string"),
          lit(" s"), col("l_suppkey").cast("string"),
          lit(" q"), col("l_quantity").cast("long").cast("string"),
          lit(" o"), col("o_orderkey").cast("string"),
          lit(" "), col("l_returnflag"), col("l_linestatus"),
          lit(" p"), col("o_orderpriority")).as("text"),
        when(col("turn_idx") % 3 === 2,
          concat(lit("t"), (col("l_suppkey") % 7).cast("string")))
          .otherwise(lit("")).as("tool"),
        col("l_shipdate").as("ts"),
        col("o_orderkey").as("_okey"))
      .withColumn("_tag", explode(
        when(col("_okey") % 10 === 0, array(lit("c"), lit("d")))
          .otherwise(array(lit("c")))))
      .select(
        concat(col("_tag"), col("_okey").cast("string")).as("conv_id"),
        col("turn_idx"), col("role"),
        // perturbation: drop last 3 chars (keeps JW similarity high,
        // breaks exact / last_nchars equality)
        when(col("_tag") === "d",
          col("text").substr(lit(1), length(col("text")) - 3))
          .otherwise(col("text")).as("text"),
        col("tool"), col("ts"))
  }

  /** The input_hint turn schema — what a user-supplied corpus must
    * carry (BASELINE.json input_hint; reference api.py:83-93 accepts
    * any df of this shape). */
  val turnSchema: String =
    "conv_id string, turn_idx int, role string, text string, " +
      "tool string, ts timestamp_ntz"

  /** S1 ingest seam for USER-SUPPLIED corpora: read a transcript-turn
    * table from parquet or CSV — the reference's documented first-run
    * entry path is CSV (docs/source/usage/dedupe.rst train block:
    * `pd.read_csv(...)` → `api.Dedupe(df=df)`, api.py:83-93). Returns
    * the same shape as [[transcripts]], so `Normalize.normalize` and
    * everything downstream is source-agnostic.
    *
    * CSV reads with an EXPLICIT schema, never inferSchema: inference
    * is a full extra pass over the data (at 100 TB, a second scan),
    * and silently-inferred types drift per partition sample. Headers
    * on, quoted fields handled by the Spark CSV parser (multiline off
    * — one turn per line keeps the input splittable for parallel
    * scans; a corpus with embedded newlines should land as parquet).
    */
  def readTurns(spark: SparkSession, path: String,
                format: String = "auto"): DataFrame = {
    // compression suffixes are transparent to the Spark CSV reader —
    // strip them BEFORE extension sniffing so x.tsv.gz reads as a
    // tab-separated file, not as parquet (and not with sep=",")
    val base = path.stripSuffix(".gz").stripSuffix(".bz2").stripSuffix(".zst")
    val fmt =
      if (format != "auto") format
      else if (base.endsWith(".csv") || base.endsWith(".tsv")) "csv"
      else "parquet"
    fmt match {
      case "csv" =>
        spark.read
          .option("header", "true")
          .option("sep", if (base.endsWith(".tsv")) "\t" else ",")
          .schema(turnSchema)
          .csv(path)
      case "parquet" => spark.read.schema(turnSchema).parquet(path)
      case other => throw new IllegalArgumentException(
        s"readTurns: unsupported format '$other' (csv, parquet)")
    }
  }

  /** DuckDB sibling CTEs producing the identical table. Two flat CTEs
    * (no nested WITH — that breaks inside WITH RECURSIVE): prepend as
    * `WITH <oracleCte>` and select from `transcripts`.
    */
  val oracleCte: String =
    """t_base AS (
      |  SELECT CAST(row_number() OVER (PARTITION BY o_orderkey
      |             ORDER BY l_linenumber, l_partkey, l_suppkey) - 1 AS INT)
      |           AS turn_idx,
      |         'i' || CAST(l_partkey AS VARCHAR)
      |           || ' s' || CAST(l_suppkey AS VARCHAR)
      |           || ' q' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
      |           || ' o' || CAST(o_orderkey AS VARCHAR)
      |           || ' ' || l_returnflag || l_linestatus
      |           || ' p' || o_orderpriority AS text,
      |         l_suppkey AS _skey,
      |         l_shipdate AS ts,
      |         o_orderkey AS _okey
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |),
      |transcripts AS (
      |  SELECT tag || CAST(_okey AS VARCHAR) AS conv_id, turn_idx,
      |         CASE turn_idx % 3 WHEN 0 THEN 'user'
      |              WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      |         CASE WHEN tag = 'd'
      |              THEN substring(text, 1, length(text) - 3)
      |              ELSE text END AS text,
      |         CASE WHEN turn_idx % 3 = 2
      |              THEN 't' || CAST(_skey % 7 AS VARCHAR)
      |              ELSE '' END AS tool,
      |         ts
      |  FROM (
      |    SELECT *, unnest(CASE WHEN _okey % 10 = 0
      |                     THEN ['c', 'd'] ELSE ['c'] END) AS tag
      |    FROM t_base)
      |)""".stripMargin
}

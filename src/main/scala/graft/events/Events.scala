package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table
  * (event_id, ts, user_id, event_type, value, props) — the
  * sessionization path a behavioural / interaction-log pipeline needs
  * next to the transcript ops.
  *
  * Scale shape: every window here is PARTITIONED BY user_id — per-user
  * event counts are bounded (one human's clickstream), so no partition
  * can grow with the corpus; the session rollup is an ordinary grouped
  * aggregation with map-side partials. Both mirrored in DuckDB SQL.
  */
object Events {

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Classic gap-based sessionization: a new session starts when a
    * user's inter-event gap exceeds `gapMinutes`. session_id =
    * user_id # ordinal. Ties on ts are totalized by event_id
    * (deterministic across engines). Timestamps compare at SECOND
    * granularity (floor(epoch)) — identical truncation both engines.
    */
  def sessionize(e: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // ts arrives as TIMESTAMP_NTZ; the session runs UTC, so routing
    // through TIMESTAMP gives the same naive epoch DuckDB's epoch()
    // computes
    val secs = col("ts").cast("timestamp").cast("long")
    val prev = lag(secs, 1).over(w)
    e.withColumn("_new",
        when(prev.isNull || secs - prev > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("sess_idx", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("ts"),
        concat(col("user_id").cast("string"), lit("#"),
          col("sess_idx").cast("string")).as("session_id"))
  }

  def sessionizeSql(gapMinutes: Int = 30): String =
    s"""SELECT event_id, user_id, ts,
       |  CAST(user_id AS VARCHAR) || '#' || CAST(sess_idx AS VARCHAR)
       |    AS session_id
       |FROM (
       |  SELECT event_id, user_id, ts,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sess_idx
       |  FROM (
       |    SELECT event_id, user_id, ts,
       |      CASE WHEN prev_s IS NULL
       |                OR CAST(floor(epoch(ts)) AS BIGINT) - prev_s
       |                   > ${gapMinutes * 60L}
       |           THEN 1 ELSE 0 END AS is_new
       |    FROM (
       |      SELECT event_id, user_id, ts,
       |        lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
       |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
       |      FROM events)))""".stripMargin

  /** Semi-structured props extraction + rollup: pull `$.k` out of the
    * JSON props column (get_json_object — codegen'd path expression,
    * no UDF) and aggregate per event type. The JSON-flattening op
    * every event pipeline runs before anything relational can happen;
    * malformed/missing props yield NULL and drop out of the numeric
    * aggregates in both engines. */
  def propsStats(e: DataFrame): DataFrame =
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        coalesce(sum(col("k")), lit(0L)).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))

  val propsStatsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  count(k) AS n_with_k,
      |  CAST(coalesce(sum(k), 0) AS BIGINT) AS k_sum,
      |  min(k) AS k_min, max(k) AS k_max
      |FROM (
      |  SELECT event_type,
      |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |GROUP BY event_type""".stripMargin

  /** Per-session rollup: event count, distinct types, duration (sec),
    * value sum in integer cents — each float value is quantized
    * (floor(v·100)) BEFORE summing, so the aggregate is an exact
    * integer sum in any order (float-sum reduction order differs
    * between engines). Grouped agg with map-side partials — no window.
    */
  def sessionStats(sessions: DataFrame, raw: DataFrame): DataFrame =
    sessions.join(raw.select("event_id", "event_type", "value"), "event_id")
      .groupBy("session_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        (max(col("ts").cast("timestamp").cast("long")) -
          min(col("ts").cast("timestamp").cast("long")))
          .as("duration_sec"),
        sum(floor(col("value").cast("double") * 100.0).cast("long"))
          .as("value_cents"))

  def sessionStatsSql(gapMinutes: Int = 30): String =
    s"""SELECT s.session_id,
       |  count(*) AS n_events,
       |  count(DISTINCT e.event_type) AS n_types,
       |  max(CAST(floor(epoch(s.ts)) AS BIGINT)) -
       |    min(CAST(floor(epoch(s.ts)) AS BIGINT)) AS duration_sec,
       |  CAST(sum(CAST(floor(CAST(e.value AS DOUBLE) * 100.0) AS BIGINT))
       |    AS BIGINT) AS value_cents
       |FROM (
       |${sessionizeSql(gapMinutes).linesIterator.map("  " + _).mkString("\n")}
       |) s JOIN events e ON s.event_id = e.event_id
       |GROUP BY s.session_id""".stripMargin
}

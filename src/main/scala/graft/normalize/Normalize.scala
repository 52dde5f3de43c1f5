package graft.normalize

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** One turn of a conversation (matches BASELINE.json input_hint). */
case class Turn(conv_id: String, turn_idx: Int, role: String,
                text: String, tool: String, ts: Timestamp)

/** Per-conversation signature record — plays the role of the
  * reference's `df` table (one row per entity, string attributes;
  * oagdedupe db/postgres/tables.py:167-177). The dedupe `attributes`
  * (settings.py:77 analog) are `head_text, full_text, role_seq,
  * tool_set`.
  */
case class SignatureRecord(
    conv_id: String,
    n_turns: Int,
    head_text: String,
    full_text: String,
    role_seq: String,
    tool_set: String,
    ts_min: Timestamp)

object Normalize {

  /** The dedupe attribute columns, in canonical order. */
  val attributes: Seq[String] =
    Seq("head_text", "full_text", "role_seq", "tool_set")

  /** Attributes offered to the BLOCKING learner. `full_text` is
    * excluded: its n-gram signatures over the tiny synthetic vocabulary
    * are almost all hot keys (every record shares most 4-grams), so it
    * only burns inverted-index volume without discriminating — it stays
    * a distance/feature attribute. Mirrors the reference's runtime
    * `attributes` config choice (settings.py:77).
    */
  val blockingAttributes: Seq[String] =
    Seq("head_text", "role_seq", "tool_set")

  /** Turns → signature records via typed-Dataset-friendly aggregation
    * with STABLE TURN ORDERING: `array_sort(collect_list(struct(turn_idx,
    * …)))` makes the result independent of shuffle/partition order — the
    * row-level invariant demanded by BASELINE.json (`per-turn text
    * equality under stable turn ordering`).
    *
    * One shuffle on conv_id; at 10^12-turn scale this is a hash
    * aggregation with map-side partial `collect_list` — no window, no
    * sort of the whole table.
    */
  def normalize(turns: DataFrame): DataFrame = {
    val sorted = array_sort(collect_list(struct(
      col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))))
    turns
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).cast("int").as("n_turns"),
        min_by(col("text"), col("turn_idx")).as("head_text"),
        array_join(transform(sorted, t => t.getField("text")), " ")
          .as("full_text"),
        array_join(transform(sorted, t => t.getField("role")), " ")
          .as("role_seq"),
        array_join(
          array_sort(array_distinct(collect_list(
            when(col("tool") =!= "", col("tool"))))), ",").as("tool_set"),
        min(col("ts")).as("ts_min"))
  }

  /** Typed variant for API callers who want compile-time row checks. */
  def normalizeTyped(turns: Dataset[Turn]): Dataset[SignatureRecord] = {
    val spark = turns.sparkSession
    import spark.implicits._
    normalize(turns.toDF()).as[SignatureRecord]
  }

  /** Round-trip: explode signature records back to (conv_id, turn_idx,
    * text) in stable turn order — used by the invariant test that every
    * turn's text survives normalization unchanged.
    */
  def explodeTurns(turns: DataFrame): DataFrame = {
    val sorted = array_sort(collect_list(struct(col("turn_idx"), col("text"))))
    turns.groupBy(col("conv_id"))
      .agg(sorted.as("turns"))
      .select(col("conv_id"), explode(col("turns")).as("t"))
      .select(col("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("t.text").as("text"))
  }

  /** DuckDB SQL equivalent of [[normalize]] over the `transcripts` CTE. */
  val oracleSelect: String =
    """SELECT conv_id,
      |       CAST(count(*) AS INT) AS n_turns,
      |       arg_min(text, turn_idx) AS head_text,
      |       string_agg(text, ' ' ORDER BY turn_idx) AS full_text,
      |       string_agg(role, ' ' ORDER BY turn_idx) AS role_seq,
      |       coalesce(string_agg(DISTINCT nullif(tool, '') , ','
      |                           ORDER BY nullif(tool, '')), '') AS tool_set,
      |       min(ts) AS ts_min
      |FROM transcripts GROUP BY conv_id""".stripMargin
}

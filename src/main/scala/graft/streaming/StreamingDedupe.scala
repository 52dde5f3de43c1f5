package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface — beyond the reference (oagdedupe is
  * batch-only, SURVEY §2.11): the operators a continuously-ingesting
  * training-data pipeline needs, expressed on the streaming engine so
  * the SAME logical ops (hash-dedup, per-conversation aggregation) run
  * incrementally with bounded state.
  *
  *   - [[firstSeen]]: streaming exact-dedup — emit only the first
  *     arrival of each content hash; `dropDuplicatesWithinWatermark`
  *     keeps the hash state bounded by event time (at 100 TB/day the
  *     state store holds one small row per distinct hash within the
  *     watermark, not the corpus).
  *   - [[runningConversationStats]]: per-conversation running state via
  *     `mapGroupsWithState` — the custom-state path
  *     (KeyValueGroupedDataset) for aggregations the built-in windowed
  *     aggs can't express (here: monotone turn counter + first/last
  *     text tracking, emitted in update mode each microbatch).
  *
  * Both are driven by MemoryStream in StreamingDedupeSpec — source/sink
  * plumbing is the caller's choice (`readStream.format("parquet")` on a
  * landing directory in production).
  */
object StreamingDedupe {

  /** Streaming exact-dedup: first arrival per md5(text) within the
    * watermark passes, later copies are dropped. Input must carry
    * (doc_id, text, ts). */
  def firstSeen(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class TurnEvent(conv_id: String, turn_idx: Int, text: String)
  final case class ConvState(n_turns: Int, head_text: String,
                             last_text: String)
  final case class ConvUpdate(conv_id: String, n_turns: Int,
                              head_text: String, last_text: String)

  /** Per-conversation running signature via explicit GroupState —
    * emits the updated (n_turns, head_text, last_text) for every
    * conversation touched by the microbatch. head_text = text of the
    * lowest turn_idx seen so far (same definition as the batch
    * Normalize), robust to out-of-order arrival within a group.
    */
  def runningConversationStats(turns: Dataset[TurnEvent]): Dataset[ConvUpdate] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvUpdate](GroupStateTimeout.NoTimeout) {
        case (convId, events, state: GroupState[ConvState]) =>
          val sorted = events.toSeq.sortBy(_.turn_idx)
          val prev = state.getOption.getOrElse(ConvState(0, null, null))
          val head =
            if (prev.head_text != null) prev.head_text
            else sorted.headOption.map(_.text).orNull
          val next = ConvState(
            prev.n_turns + sorted.size,
            head,
            sorted.lastOption.map(_.text).getOrElse(prev.last_text))
          state.update(next)
          ConvUpdate(convId, next.n_turns, next.head_text, next.last_text)
      }
  }
}

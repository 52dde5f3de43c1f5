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
  *
  * STATE-SCHEMA COMPATIBILITY: the state case classes here (ConvState,
  * SessState, BandState) are part of each query's CHECKPOINT format —
  * changing their fields (as this library did when hardening replay
  * idempotency and TTL monotonicity) breaks restart-from-checkpoint of
  * a query started under the old schema. Upgrading a live query across
  * such a change requires draining it and starting a fresh checkpoint
  * (the standard Structured Streaming stateful-upgrade constraint).
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

  /** Running per-conversation state. head/last carry their turn_idx so
    * a LATER microbatch delivering an EARLIER turn (out-of-order
    * arrival) still wins/loses on index comparison, exactly like the
    * batch Normalize's min_by/max_by over turn_idx. `seen_idxs` makes
    * replayed/duplicate turn events idempotent (n_turns = distinct
    * turns); a conversation's turn count is bounded (it is one
    * dialogue, not the corpus), so the set is small state. */
  final case class ConvState(seen_idxs: Set[Int],
                             head_idx: Int, head_text: String,
                             last_idx: Int, last_text: String)
  final case class ConvUpdate(conv_id: String, n_turns: Int,
                              head_text: String, last_text: String)

  /** Per-conversation running signature via explicit GroupState —
    * emits the updated (n_turns, head_text, last_text) for every
    * conversation touched by the microbatch. head_text = text of the
    * lowest turn_idx seen so far, last_text = highest — across ALL
    * microbatches, whatever order turns arrive in.
    */
  final case class SessEvent(user_id: Long, event_id: Long,
                             ts: java.sql.Timestamp)
  /** `seen` = event_ids folded into THIS open session (bounded: one
    * user's events within one session window, dropped with the state
    * at close) — makes at-least-once redelivery idempotent while the
    * session is open. A replay arriving after its session already
    * closed starts a fresh session (deduping those would need a
    * tombstone per event ever seen — unbounded state); sinks needing
    * exactly-once across that window should dedupe on session_id
    * downstream. */
  final case class SessState(first_sec: Long, last_sec: Long,
                             n_events: Int, seen: Set[Long])
  final case class ClosedSession(user_id: Long, session_id: String,
                                 n_events: Int, duration_sec: Long)

  /** Streaming gap-based sessionization — the incremental form of the
    * batch `events.Events.sessionize`: a user's session CLOSES when
    * event time advances `gapMinutes` past their last event, detected
    * two ways: a later event arriving in-stream (gap split) or the
    * EVENT-TIME TIMEOUT firing once the watermark passes last+gap (no
    * further event ever comes — the case batch jobs get for free and
    * streams must handle explicitly). Emits only CLOSED sessions
    * (append mode); state is one small struct per OPEN session,
    * dropped at close — bounded by concurrently-active users, not the
    * stream's history.
    *
    * session_id = `uid @ start-second` — globally unique WITHOUT
    * remembering per-user ordinals (an ordinal would either be lost at
    * timeout, recycling ids, or require a tombstone per user ever
    * seen, unbounding the state store). Out-of-order events still
    * inside the watermark extend the open session BACKWARD
    * (first_sec is a min, like the batch job's); an event more than
    * gap earlier than the open session's start is a late orphan and
    * closes immediately as its own single-event session (id suffixed
    * with the event_id — two orphans in one truncated second must not
    * collide). Note the orphan path is only live when the watermark
    * DELAY exceeds the gap: with delay ≤ gap the engine's late-row
    * filter drops such events before they reach this function.
    */
  def streamingSessions(events: Dataset[SessEvent], gapMinutes: Int = 30,
                        watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapSec = gapMinutes * 60L
    def close(uid: Long, st: SessState): ClosedSession =
      ClosedSession(uid, s"$uid@${st.first_sec}", st.n_events,
        st.last_sec - st.first_sec)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, batch, state: GroupState[SessState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          if (state.hasTimedOut) {
            out += close(uid, state.get)
            state.remove()
          } else {
            var st = state.getOption.orNull
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val sec = e.ts.getTime / 1000L
              if (st != null && st.seen.contains(e.event_id)) {
                // at-least-once redelivery of an event already folded
                // into the open session: idempotent no-op
              } else if (st == null)
                st = SessState(sec, sec, 1, Set(e.event_id))
              else if (sec - st.last_sec > gapSec) {
                out += close(uid, st)
                st = SessState(sec, sec, 1, Set(e.event_id))
              } else if (st.first_sec - sec > gapSec) {
                // late orphan: earlier than the open session by more
                // than the gap — its own session, already over. The
                // event_id suffix keeps session_ids globally unique
                // even when two orphans land in the same truncated
                // second (or collide with a session's start second).
                out += ClosedSession(uid, s"$uid@$sec#${e.event_id}", 1, 0L)
                st = st.copy(seen = st.seen + e.event_id)
              } else
                st = SessState(
                  math.min(sec, st.first_sec),
                  math.max(sec, st.last_sec),
                  st.n_events + 1,
                  st.seen + e.event_id)
            }
            if (st != null) {
              state.update(st)
              // clamp: a very LATE batch can carry last+gap below the
              // current watermark, and setTimeoutTimestamp rejects
              // past timestamps (query crash). Clamping to
              // watermark+1 closes the already-expired session at the
              // next trigger — the event-time-correct outcome.
              state.setTimeoutTimestamp(math.max(
                (st.last_sec + gapSec) * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }

  final case class BandedDoc(doc_id: Long, band: String,
                             ts: java.sql.Timestamp)
  /** Bucket state: member ids + the max member event-time. `max_ms` is
    * what makes the idle-TTL deadline MONOTONE: a late (within-
    * watermark) OLDER arrival must not shorten an active bucket's
    * timeout, so the deadline is always newest-member-ts + TTL. */
  final case class BandState(members: Seq[Long], max_ms: Long)
  final case class CandidatePair(id_l: Long, id_r: Long, band: String)

  /** Streaming near-dup candidate generation — the LSH band join
    * expressed incrementally: documents arrive with a precomputed band
    * key (any of the batch signatures: MinHash band, SimHash mask,
    * sign-bit bucket), and each new arrival emits a candidate pair
    * against every PRIOR member of its bucket. Bucket state is capped
    * at `bucketCap` ids (the same deterministic hot-bucket defense as
    * every batch band join here — a boilerplate bucket stops emitting
    * and stops growing instead of going quadratic), so per-bucket state
    * is O(cap) — and with `idleTtlMinutes = Some(m)`, buckets whose
    * newest member is more than `m` minutes older than the WATERMARK
    * are EVICTED via event-time timeout, so the bucket COUNT is
    * bounded by the recently-active band keys, not the stream's whole
    * history. The tradeoff is explicit: an arrival after its bucket
    * expired pairs only against later members — near-dup detection
    * against documents older than the TTL belongs to the periodic
    * batch backfill (minhashPairs et al.), the standard lambda split
    * for streaming LSH.
    *
    * The TTL is ON BY DEFAULT (6 h): an unbounded-state default is the
    * wrong failure mode for a caller who never read this paragraph —
    * state must be bounded unless someone explicitly opts out.
    * `idleTtlMinutes = None` is that opt-out (NoTimeout semantics: no
    * eviction, bucket count grows with distinct band keys — acceptable
    * only when the band-key space is provably bounded, e.g. a fixed
    * SimHash mask domain). The TTL is EVENT-time,
    * not processing-time, deliberately: processing-time timeouts force
    * the micro-batch engine into a continuous loop of no-data batches
    * to fire expirations (observed here: hundreds of empty batches per
    * minute regardless of trigger pacing), while event-time timeouts
    * ride the watermark, which only moves when data flows — zero idle
    * cost, same bound. Same clamp-above-watermark guard as
    * [[streamingSessions]] so a late batch can't register a
    * past-timestamp timeout (query crash).
    *
    * The default TTL therefore also applies `withWatermark(ts,
    * watermark)` — and a watermark makes the engine DROP rows arriving
    * more than `watermark` behind the stream's max event time, before
    * the state function ever sees them. A deep backfill/replay whose
    * timestamps lag live traffic by hours must widen `watermark` to
    * cover the lag, or opt out entirely with `idleTtlMinutes = None`
    * (which disables the watermark and the eviction bound together —
    * the previous process-everything behavior).
    */
  def streamingBandCandidates(docs: Dataset[BandedDoc],
                              bucketCap: Int = 200,
                              idleTtlMinutes: Option[Int] = Some(360),
                              watermark: String = "1 hour"): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val timeoutConf = if (idleTtlMinutes.isDefined)
      GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    val src = if (idleTtlMinutes.isDefined) docs.withWatermark("ts", watermark)
              else docs
    src.groupByKey(_.band)
      .flatMapGroupsWithState[BandState, CandidatePair](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
        case (band, events, state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              BandState(Seq.empty, Long.MinValue))
            var members = prev.members
            // deadline derives from the NEWEST member ever seen, not
            // this batch's max: a late older arrival must never pull
            // an active bucket's timeout earlier (premature eviction)
            var maxEventMs = prev.max_ms
            val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
            events.foreach { e =>
              maxEventMs = math.max(maxEventMs, e.ts.getTime)
              if (!members.contains(e.doc_id) && members.size < bucketCap) {
                members.foreach { m =>
                  out += CandidatePair(math.min(m, e.doc_id),
                    math.max(m, e.doc_id), band)
                }
                members = members :+ e.doc_id
              }
            }
            state.update(BandState(members, maxEventMs))
            idleTtlMinutes.foreach { m =>
              state.setTimeoutTimestamp(math.max(
                maxEventMs + m * 60000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  def runningConversationStats(turns: Dataset[TurnEvent]): Dataset[ConvUpdate] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvUpdate](GroupStateTimeout.NoTimeout) {
        case (convId, events, state: GroupState[ConvState]) =>
          val prev = state.getOption.getOrElse(
            ConvState(Set.empty, Int.MaxValue, null, Int.MinValue, null))
          val next = events.foldLeft(prev) { (st, e) =>
            if (st.seen_idxs.contains(e.turn_idx)) st
            else ConvState(
              st.seen_idxs + e.turn_idx,
              if (e.turn_idx < st.head_idx) e.turn_idx else st.head_idx,
              if (e.turn_idx < st.head_idx) e.text else st.head_text,
              if (e.turn_idx > st.last_idx) e.turn_idx else st.last_idx,
              if (e.turn_idx > st.last_idx) e.text else st.last_text)
          }
          state.update(next)
          ConvUpdate(convId, next.seen_idxs.size, next.head_text,
            next.last_text)
      }
  }
}

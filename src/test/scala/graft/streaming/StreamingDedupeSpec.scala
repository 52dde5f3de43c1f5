package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSuite
import java.sql.Timestamp

class StreamingDedupeSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming firstSeen drops duplicate content across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Timestamp)]
    val docs = source.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedupe.firstSeen(docs)
      .writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts, one in-batch duplicate
      source.addData((1L, "alpha beta", ts(0)), (2L, "gamma delta", ts(1)),
        (3L, "alpha beta", ts(2)))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate and one new text
      source.addData((4L, "alpha beta", ts(3)), (5L, "epsilon zeta", ts(4)))
      q.processAllAvailable()
      val seen = spark.table("first_seen")
        .select("text").as[String].collect().sorted.toSeq
      assert(seen == Seq("alpha beta", "epsilon zeta", "gamma delta"))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-conversation running state") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.TurnEvent]
    val q = StreamingDedupe.runningConversationStats(source.toDS())
      .writeStream.format("memory").queryName("conv_stats")
      .outputMode("update").start()
    try {
      source.addData(
        StreamingDedupe.TurnEvent("c1", 2, "world"),
        StreamingDedupe.TurnEvent("c1", 1, "hello"),
        StreamingDedupe.TurnEvent("c2", 1, "solo"))
      q.processAllAvailable()
      source.addData(StreamingDedupe.TurnEvent("c1", 3, "again"))
      q.processAllAvailable()
      val last = spark.table("conv_stats")
        .groupBy("conv_id")
        .agg(max(struct(col("n_turns"), col("head_text"), col("last_text")))
          .as("s"))
        .select("conv_id", "s.*")
        .collect().map(r => r.getString(0) ->
          ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
      // state accumulated ACROSS batches; head pinned to lowest turn_idx
      assert(last("c1") == ((3, "hello", "again")))
      assert(last("c2") == ((1, "solo", "solo")))
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap splits AND " +
    "event-time timeouts") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.SessEvent]
    val q = StreamingDedupe.streamingSessions(source.toDS(),
        gapMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 10 at t+0 and t+10min — one open session
      source.addData(
        StreamingDedupe.SessEvent(10L, 1L, ts(0)),
        StreamingDedupe.SessEvent(10L, 2L, ts(10)))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0) // still open
      // batch 2: t+50min — 40 min gap closes session 1 in-stream
      source.addData(StreamingDedupe.SessEvent(10L, 3L, ts(50)))
      q.processAllAvailable()
      // batch 3: another user far in the future advances the watermark
      // past session 2's last+gap → the TIMEOUT closes it
      source.addData(StreamingDedupe.SessEvent(99L, 4L, ts(300)))
      q.processAllAvailable()
      source.addData(StreamingDedupe.SessEvent(99L, 5L, ts(301)))
      q.processAllAvailable()
      val closed = spark.table("closed_sessions")
        .collect().map(r => r.getString(1) -> ((r.getInt(2), r.getLong(3))))
        .toMap
      // session_id = uid@start-second (globally unique across closures)
      val base = 1700000000L
      assert(closed.contains(s"10@$base") &&
        closed(s"10@$base") == ((2, 600L)))
      val s2 = s"10@${base + 50 * 60}"
      assert(closed.contains(s2) && closed(s2) == ((1, 0L)))
    } finally q.stop()
  }

  test("streaming band candidates pair new arrivals against prior " +
    "bucket members, bounded by the bucket cap") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.BandedDoc]
    val q = StreamingDedupe.streamingBandCandidates(source.toDS(),
        bucketCap = 3)
      .writeStream.format("memory").queryName("band_cands")
      .outputMode("append").start()
    try {
      source.addData(
        StreamingDedupe.BandedDoc(1L, "b1", ts(0)),
        StreamingDedupe.BandedDoc(2L, "b1", ts(1)),
        StreamingDedupe.BandedDoc(9L, "b2", ts(2)))
      q.processAllAvailable()
      // batch 2: cross-batch candidate + duplicate replay + cap overflow
      source.addData(
        StreamingDedupe.BandedDoc(3L, "b1", ts(3)),  // pairs with 1 and 2
        StreamingDedupe.BandedDoc(2L, "b1", ts(4)),  // replay: no new pairs
        StreamingDedupe.BandedDoc(4L, "b1", ts(5)))  // bucket full (cap 3)
      q.processAllAvailable()
      val pairs = spark.table("band_cands")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally q.stop()
  }

  test("streaming sessions: at-least-once replay is idempotent and " +
    "same-second orphans get distinct session ids") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.SessEvent]
    // watermark delay (2 h) > session gap (30 min): late orphans reach
    // the function instead of being dropped by the engine's late-row
    // filter — the only regime where the orphan path is live
    val q = StreamingDedupe.streamingSessions(source.toDS(),
        gapMinutes = 30, watermark = "2 hours")
      .writeStream.format("memory").queryName("sess_idem")
      .outputMode("append").start()
    try {
      val base = 1700000000L
      // batch 1: open session for user 7 spanning t+40..t+50
      source.addData(
        StreamingDedupe.SessEvent(7L, 1L, ts(40)),
        StreamingDedupe.SessEvent(7L, 2L, ts(50)))
      q.processAllAvailable()
      // batch 2: event 2 REPLAYED (at-least-once), one genuinely new
      // event, and two late orphans in the SAME truncated second
      source.addData(
        StreamingDedupe.SessEvent(7L, 2L, ts(50)),   // replay: no-op
        StreamingDedupe.SessEvent(7L, 3L, ts(55)),
        StreamingDedupe.SessEvent(7L, 100L, ts(0)),  // orphan
        StreamingDedupe.SessEvent(7L, 101L, ts(0)))  // orphan, same sec
      q.processAllAvailable()
      // batch 3: 40-min gap closes the open session in-stream
      source.addData(StreamingDedupe.SessEvent(7L, 4L, ts(100)))
      q.processAllAvailable()
      val closed = spark.table("sess_idem")
        .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
      // orphan ids disambiguated by event_id — BOTH survive
      assert(closed.contains(s"7@$base#100") && closed(s"7@$base#100") == 1)
      assert(closed.contains(s"7@$base#101") && closed(s"7@$base#101") == 1)
      // replayed event NOT double-counted: 3 distinct events, not 4
      assert(closed(s"7@${base + 40 * 60}") == 3)
    } finally q.stop()
  }

  test("streaming band candidates: idle buckets expire via event-time " +
    "TTL and restart fresh") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.BandedDoc]
    val q = StreamingDedupe.streamingBandCandidates(source.toDS(),
        bucketCap = 10, idleTtlMinutes = Some(30),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("band_ttl")
      .outputMode("append").start()
    try {
      // batch 1: bucket b9 = {1} at t+0
      source.addData(StreamingDedupe.BandedDoc(1L, "b9", ts(0)))
      q.processAllAvailable()
      // batch 2: another band far in the future advances the watermark
      // to t+110min — past b9's t+30min TTL
      source.addData(StreamingDedupe.BandedDoc(50L, "other", ts(120)))
      q.processAllAvailable()
      // batch 3: b9's expired timeout FIRES (timed-out groups are
      // processed on the trigger after the watermark passes) → evicted
      source.addData(StreamingDedupe.BandedDoc(51L, "other", ts(121)))
      q.processAllAvailable()
      // evicted: doc 2 pairs with nothing...
      source.addData(StreamingDedupe.BandedDoc(2L, "b9", ts(125)))
      q.processAllAvailable()
      // ...but the bucket RESTARTED: doc 3 pairs with doc 2 only
      source.addData(StreamingDedupe.BandedDoc(3L, "b9", ts(126)))
      q.processAllAvailable()
      val pairs = spark.table("band_ttl").filter(col("band") === "b9")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((2L, 3L)),
        s"expected stale-bucket eviction then fresh restart, got $pairs")
    } finally q.stop()
  }

  test("streaming band candidates: a late OLDER arrival does not " +
    "shorten an active bucket's TTL deadline (monotone timeout)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.BandedDoc]
    val q = StreamingDedupe.streamingBandCandidates(source.toDS(),
        bucketCap = 10, idleTtlMinutes = Some(30),
        watermark = "2 hours")
      .writeStream.format("memory").queryName("band_ttl_mono")
      .outputMode("append").start()
    try {
      // bucket b1 = {1} at t+60 → deadline t+90
      source.addData(StreamingDedupe.BandedDoc(1L, "b1", ts(60)))
      q.processAllAvailable()
      // LATE but within-watermark older member at t+5: with a
      // batch-local deadline this would re-register the timeout at
      // t+35; the deadline must stay keyed to the newest member (t+90)
      source.addData(StreamingDedupe.BandedDoc(2L, "b1", ts(5)))
      q.processAllAvailable()
      // advance watermark to ~t+40 (160 - 120min delay) — past the
      // WRONG deadline (t+35), before the correct one (t+90)
      source.addData(StreamingDedupe.BandedDoc(50L, "other", ts(160)))
      q.processAllAvailable()
      source.addData(StreamingDedupe.BandedDoc(51L, "other", ts(161)))
      q.processAllAvailable()
      // bucket must still be alive: doc 3 pairs against BOTH members
      source.addData(StreamingDedupe.BandedDoc(3L, "b1", ts(80)))
      q.processAllAvailable()
      val pairs = spark.table("band_ttl_mono").filter(col("band") === "b1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"late older arrival evicted a live bucket: got $pairs")
    } finally q.stop()
  }

  test("out-of-order arrival across microbatches still pins head/last " +
    "by turn_idx, and replayed turns don't double-count") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[StreamingDedupe.TurnEvent]
    val q = StreamingDedupe.runningConversationStats(source.toDS())
      .writeStream.format("memory").queryName("conv_stats_ooo")
      .outputMode("update").start()
    try {
      // batch 1: only turn 5 has arrived
      source.addData(StreamingDedupe.TurnEvent("c9", 5, "late-head? no"))
      q.processAllAvailable()
      // batch 2: turn 0 arrives LATE + turn 5 is replayed (at-least-once
      // delivery) + turn 2 in the middle
      source.addData(
        StreamingDedupe.TurnEvent("c9", 0, "true head"),
        StreamingDedupe.TurnEvent("c9", 5, "late-head? no"),
        StreamingDedupe.TurnEvent("c9", 2, "middle"))
      q.processAllAvailable()
      val rows = spark.table("conv_stats_ooo")
        .filter(col("conv_id") === "c9")
        .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3)))
      // batch-1 emission saw only turn 5
      assert(rows.contains((1, "late-head? no", "late-head? no")))
      // batch-2 emission: head regressed to turn 0, last stays turn 5,
      // replayed turn 5 NOT double-counted (3 distinct turns, not 4)
      assert(rows.contains((3, "true head", "late-head? no")))
    } finally q.stop()
  }
}

package graft.events

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import java.sql.Timestamp

class EventsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private def fixture = Seq(
    // user 1: events at 0, 10, 50 min → gap 40 > 30 splits session
    (1L, ts(0), 10L, "view", 1.5f),
    (2L, ts(10), 10L, "click", 2.25f),
    (3L, ts(50), 10L, "view", 0.5f),
    // user 2: single event
    (4L, ts(5), 20L, "view", 3.0f))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("gap-based sessionization splits on the gap and not within it") {
    val s = Events.sessionize(fixture).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(s(1L) == "10#1" && s(2L) == "10#1") // same session
    assert(s(3L) == "10#2")                    // split by the 40-min gap
    assert(s(4L) == "20#1")
  }

  test("session stats: counts, types, duration, exact cents") {
    val stats = Events.sessionStats(Events.sessionize(fixture), fixture)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // session 10#1: 2 events, 2 types, 10 min, 1.50 + 2.25 = 375 cents
    assert(stats("10#1") == ((2L, 2L, 600L, 375L)))
    assert(stats("10#2") == ((1L, 1L, 0L, 50L)))
    assert(stats("20#1") == ((1L, 1L, 0L, 300L)))
  }
}

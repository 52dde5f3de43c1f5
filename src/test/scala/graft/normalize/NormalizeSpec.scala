package graft.normalize

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.synth.Transcripts
import java.sql.Timestamp

class NormalizeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  private lazy val turns = Seq(
    // deliberately out of order: stable turn ordering must fix it
    Turn("c1", 2, "tool", "three", "t1", ts(3)),
    Turn("c1", 0, "user", "one", "", ts(1)),
    Turn("c1", 1, "assistant", "two", "", ts(2)),
    Turn("c2", 0, "user", "solo", "", ts(4))).toDS().toDF()

  test("signature record fields under stable turn ordering") {
    val recs = Normalize.normalize(turns).collect()
      .map(r => r.getAs[String]("conv_id") -> r).toMap
    val c1 = recs("c1")
    assert(c1.getAs[Int]("n_turns") == 3)
    assert(c1.getAs[String]("head_text") == "one")
    assert(c1.getAs[String]("full_text") == "one two three")
    assert(c1.getAs[String]("role_seq") == "user assistant tool")
    assert(c1.getAs[String]("tool_set") == "t1")
    assert(c1.getAs[Timestamp]("ts_min") == ts(1))
    val c2 = recs("c2")
    assert(c2.getAs[String]("full_text") == "solo")
    assert(c2.getAs[String]("tool_set") == "")
  }

  test("row-level invariant: per-turn text equality round-trip (BASELINE input_hint)") {
    val sfDir = "/root/testdata/sf0.001"
    val t = Transcripts.transcripts(spark, sfDir)
    val back = Normalize.explodeTurns(t)
      .select("conv_id", "turn_idx", "text")
    val orig = t.select("conv_id", "turn_idx", "text")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("normalize is shuffle-order independent") {
    val shuffled = turns.repartition(7)
    val a = Normalize.normalize(turns).orderBy("conv_id").collect().toSeq
    val b = Normalize.normalize(shuffled).orderBy("conv_id").collect().toSeq
    assert(a == b)
  }

  test("typed Dataset path") {
    val ds = turns.as[Turn]
    val recs = Normalize.normalizeTyped(ds).collect()
    assert(recs.map(_.conv_id).sorted.toSeq == Seq("c1", "c2"))
    assert(recs.find(_.conv_id == "c1").get.full_text == "one two three")
  }
}

package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite
import java.nio.file.Files

class TableIOSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def freshIO() = {
    val dir = Files.createTempDirectory("graft_tableio").toString
    (new TableIO(spark, dir), dir)
  }

  test("stage computes once, then resumes from committed parquet") {
    val (io, _) = freshIO()
    var computeCount = 0
    def compute = {
      computeCount += 1
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    val first = io.stage("s1")(compute).collect()
    val second = io.stage("s1")(compute).collect()
    assert(computeCount == 1) // second call resumed from checkpoint
    assert(first.sortBy(_.getInt(0)).toSeq == second.sortBy(_.getInt(0)).toSeq)
  }

  test("invalidate forces recompute") {
    val (io, _) = freshIO()
    var n = 0
    def compute = { n += 1; Seq(n).toDF("v") }
    io.stage("s")(compute); io.invalidate("s"); io.stage("s")(compute)
    assert(n == 2)
  }

  test("invalidate works through the Hadoop FileSystem (file:-scheme root)") {
    // explicit scheme: java.io.File cannot open "file:/tmp/...", so this
    // case only passes if invalidate/committed go through FileSystem
    val dir = "file:" + Files.createTempDirectory("graft_tableio_fs").toString
    val io = new TableIO(spark, dir)
    var n = 0
    def compute = { n += 1; Seq(n).toDF("v") }
    io.stage("s")(compute)
    io.stage("s")(compute)
    assert(n == 1, "committed() missed the _SUCCESS marker through the FS")
    io.invalidate("s")
    io.stage("s")(compute)
    assert(n == 2, "invalidate() silently no-opped on the file:-scheme root")
  }

  test("stage identity: matching identity resumes, changed identity " +
    "recomputes, None accepts any committed output") {
    val (io, _) = freshIO()
    var n = 0
    def compute = { n += 1; Seq(n).toDF("v") }
    io.stage("s", Nil, Some("cfg=a"))(compute)
    io.stage("s", Nil, Some("cfg=a"))(compute)
    assert(n == 1, "same identity must resume from the committed output")
    // config change on a reused workDir: silently resuming output
    // produced under the old settings is the bug this guards
    io.stage("s", Nil, Some("cfg=b"))(compute)
    assert(n == 2, "changed identity must force a recompute")
    io.stage("s", Nil, None)(compute)
    assert(n == 2, "None identity accepts whatever is committed")
  }

  test("lineage rows record stage metrics") {
    val (io, _) = freshIO()
    io.stage("alpha", Seq("in1"))(Seq(1, 2, 3).toDF("v"))
    val lin = io.lineage().collect()
    assert(lin.length == 1)
    val r = lin.head
    assert(r.getAs[String]("stage") == "alpha")
    assert(r.getAs[Long]("rows") == 3L)
    assert(r.getAs[String]("inputs") == "in1")
    assert(r.getAs[Long]("wall_ms") >= 0L)
    assert(r.getAs[Seq[Long]]("partition_rows").sum == 3L)
  }

  test("upsert: existing keys win, new keys appended (MERGE semantics)") {
    val (io, _) = freshIO()
    io.upsert("t", Seq((1, "a"), (2, "b")).toDF("id", "v"), Seq("id"))
    val after = io.upsert("t", Seq((2, "X"), (3, "c")).toDF("id", "v"),
      Seq("id"))
    val rows = after.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(1 -> "a", 2 -> "b", 3 -> "c"))
  }
}

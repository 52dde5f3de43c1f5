package graft.synth

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.normalize.Normalize

class TranscriptsSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("CSV ingest branch: csv-landed turns normalize identically to " +
    "the parquet-derived corpus") {
    // deterministic subset of the derived corpus, landed as CSV the way
    // a first-run user would bring their own file (reference entry
    // path: pd.read_csv → api.Dedupe, docs/source/usage/dedupe.rst)
    val subset = Transcripts.transcripts(spark, sfDir)
      .filter(col("conv_id").endsWith("1"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_csv_ingest").toString + "/turns.csv"
    subset.write.option("header", "true").csv(dir)

    val back = Transcripts.readTurns(spark, dir) // auto-detects csv
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      subset.schema.map(f => (f.name, f.dataType)),
      "CSV branch did not apply the input_hint schema")

    val viaCsv = Normalize.normalize(back)
    val viaParquet = Normalize.normalize(subset)
    assert(viaCsv.count() == viaParquet.count() && viaCsv.count() > 0)
    assert(viaCsv.exceptAll(viaParquet).isEmpty &&
      viaParquet.exceptAll(viaCsv).isEmpty,
      "CSV-landed corpus normalized differently from the parquet corpus")
  }

  test("readTurns: explicit format overrides extension, unknown format " +
    "fails loudly") {
    val subset = Transcripts.transcripts(spark, sfDir)
      .filter(col("conv_id").endsWith("3")).limit(50)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_ingest").toString + "/turns_plain"
    subset.write.parquet(dir)
    assert(Transcripts.readTurns(spark, dir).count() == subset.count())
    assert(Transcripts.readTurns(spark, dir, format = "parquet")
      .count() == subset.count())
    intercept[IllegalArgumentException] {
      Transcripts.readTurns(spark, dir, format = "orc")
    }
  }
}

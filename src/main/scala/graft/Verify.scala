package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val sqlOnly = args.length > 2 && args(2) == "--sql-only"
    // --only=q37_metric_menu,q50_... : re-dump a subset (iteration aid)
    val only = args.drop(2).find(_.startsWith("--only="))
      .map(_.stripPrefix("--only=").split(",").toSet)
    new java.io.File(outDir).mkdirs()
    if (!sqlOnly) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // lshNearDupSql emits a LITERAL plane matrix for dim=64 while the
      // Spark side derives dim from the data (and hard-fails on any
      // mismatching row). Assert the corpus dim equals the SQL mirror's
      // default HERE, so a non-64-dim corpus fails the dump loudly
      // instead of the oracle silently zipping against longer plane
      // lists and "passing" with wrong bits.
      if (only.forall(_.contains("q32_emb_lsh_pairs"))) {
        // an unreadable/empty embeddings table must NOT abort the whole
        // dump — q32 alone will fail inside its own try below; only a
        // READABLE corpus with the wrong dim (oracle would silently
        // zip against longer plane lists and "pass" wrong) fails loud
        val dim = try Some(spark.read.parquet(s"$sfDir/embeddings.parquet")
          .selectExpr("size(embedding)").head().getInt(0))
        catch { case e: Throwable =>
          System.err.println(s"[verify] embeddings dim probe failed " +
            s"(q32 will fail alone): ${e.getMessage}")
          None
        }
        dim.foreach(d => require(d == 64,
          s"embeddings dim=$d but lshNearDupSql emits 64-dim planes — " +
            "regenerate the oracle with lshNearDupSql(dim = actual)"))
      }
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
      spark.stop()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}

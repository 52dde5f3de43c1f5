package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the key operator queries —
  * used to audit that filters/projections reach the parquet scans,
  * small sides broadcast, and expressions stay inside
  * WholeStageCodegen. Usage: runMain graft.Explain [sfDir] [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_normalize", "q06_candidate_pairs", "q11_scores",
        "q16_tfidf_cosine", "q26_doc_minhash_pairs", "q28_doc_simhash_hamming",
        "q31_ann_topk", "q32_emb_lsh_pairs", "q43_ann_ivf", "q50_sorted_neighborhood",
        "q53_doc_chunks", "q54_incremental", "q55_ann_pq", "q56_sessionize")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach {
      case "entry" =>
        println("\n========== entry (flagship) ==========")
        val df = SparkEntry.entry(spark)
        println(s"entry rows: ${df.count()}")
      case n =>
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

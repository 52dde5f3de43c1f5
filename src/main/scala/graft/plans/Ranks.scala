package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField}

/** Scalable global ranking.
  *
  * `row_number()` over an unpartitioned Window moves the ENTIRE dataset
  * onto one task (Spark warns "No Partition Defined ... serious
  * performance degradation") — a stop-the-world single-task sort at
  * scale. This computes the identical rank column distributed:
  *
  *   1. `repartitionByRange` on the sort key — balanced range shards,
  *      globally ordered across shard boundaries by construction
  *   2. `sortWithinPartitions` — each shard locally sorted
  *   3. `zipWithIndex` — global offsets from one O(#partitions)
  *      count job (per-partition sizes collected to the driver; no
  *      data is moved through the driver)
  *
  * The sort key must be a TOTAL order (include a unique tiebreaker),
  * otherwise ranks within ties are partition-placement-dependent.
  * RangePartitioner's boundary sampling is seeded deterministically,
  * so the same input yields the same shards — and the rank values are
  * boundary-independent anyway (global order is what defines them).
  */
object Ranks {

  /** Append 1-based rank (IntegerType — matching the SQL mirrors'
    * CAST(row_number() AS INT)) ordered by `sortCols`. Inputs beyond
    * Int.MaxValue rows FAIL LOUDLY instead of silently wrapping the
    * rank (a task exception, not corrupt output); a caller ranking
    * > 2^31 rows should widen rankCol to LongType end-to-end. */
  def withRank(df: DataFrame, sortCols: Seq[Column],
               rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ StructField(rankCol, IntegerType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      if (idx >= Int.MaxValue - 1)
        throw new IllegalStateException(
          s"Ranks.withRank: rank ${idx + 1} overflows IntegerType")
      Row.fromSeq(row.toSeq :+ (idx + 1).toInt)
    }
    spark.createDataFrame(indexed, schema)
  }
}

package graft.emb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search / near-dup over the `embeddings` table
  * (vec_id:long, embedding:array<float>, label:int).
  *
  * Numeric portability: every vector is first QUANTIZED to integers,
  * eq_i = floor(x_i · 1024). Sums of products of small integers are
  * EXACT in double arithmetic, so dot products / norms are
  * order-independent and bit-identical across Spark and DuckDB —
  * float-sum reduction order (SIMD vs sequential) can never flip a
  * result. Cosine is then quantized floor(x·10⁴)/10⁴ like every other
  * similarity in this engine.
  *
  * Scale design: brute-force top-k is the small-query-set baseline
  * (queries broadcast against the corpus, one pass, partial top-k per
  * partition via window); the LSH path buckets by sign bits so
  * candidate generation never goes all-pairs.
  */
object EmbeddingOps {

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** integer quantization (values ~N(0,1) ⇒ |eq| ≤ ~8·1024, squared
    * sums ≤ 64·2^26 ≪ 2^53: exact). */
  private def quant(c: Column): Column =
    transform(c, x => floor(x.cast("double") * lit(1024.0)))

  private val quantSql =
    "list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024.0))"

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def norm2(a: Column): Column =
    aggregate(a, lit(0.0d), (acc, v) => acc + v * v)

  private def q4(c: Column): Column = floor(c * lit(10000.0)) / lit(10000.0)

  /** per-vector stats: dimension + quantized L2 norm. */
  def vectorStats(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      size(col("embedding")).as("dim"),
      q4(sqrt(norm2(quant(col("embedding")))) / lit(1024.0)).as("norm"))

  val vectorStatsSql: String =
    s"""SELECT vec_id,
       |  CAST(length(embedding) AS INT) AS dim,
       |  floor(sqrt(list_sum(list_transform($quantSql, x -> x * x)))
       |    / 1024.0 * 10000.0) / 10000.0 AS norm
       |FROM embeddings""".stripMargin

  /** quantized cosine between two quantized-vector columns. */
  private def cosineQ(a: Column, b: Column): Column =
    q4(dot(a, b) / greatest(sqrt(norm2(a)) * sqrt(norm2(b)), lit(1.0e-12)))

  /** brute-force cosine top-k: each query vector (vec_id < nQueries)
    * against the whole corpus. The query side is tiny → broadcast
    * nested-loop; ranking via window partitioned by query.
    */
  def bruteForceTopK(e: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), quant(col("embedding")).as("qv"))
    val c = e.select(col("vec_id"), quant(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosineQ(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  def bruteForceTopKSql(nQueries: Int = 8, k: Int = 10): String =
    s"""qv AS (SELECT vec_id AS query_id, $quantSql AS qv
       |       FROM embeddings WHERE vec_id < $nQueries),
       |cv AS (SELECT vec_id, $quantSql AS cv FROM embeddings),
       |scored AS (
       |  SELECT query_id, vec_id,
       |    floor(list_sum(list_transform(list_zip(qv, cv),
       |            p -> p[1] * p[2])) /
       |      greatest(sqrt(list_sum(list_transform(qv, x -> x * x))) *
       |               sqrt(list_sum(list_transform(cv, x -> x * x))), 1e-12)
       |      * 10000.0) / 10000.0 AS cosine
       |  FROM qv JOIN cv ON query_id != vec_id
       |)
       |SELECT query_id, vec_id, cosine, rank FROM (
       |  SELECT query_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin

  /** sign-bit LSH buckets (deterministic hyperplanes = first `bits`
    * coordinate axes): near-dup pairs within a bucket with cosine ≥
    * threshold. Scale path for embedding near-dup: candidate
    * generation is a bucket equi-join, not all-pairs.
    */
  def lshNearDup(e: DataFrame, bits: Int = 8,
                 threshold: Double = 0.2): DataFrame = {
    val sigBits = (0 until bits).map { i =>
      when(element_at(col("embedding"), i + 1) >= 0, lit(1)).otherwise(lit(0))
        .cast("string")
    }
    val d = e.select(col("vec_id"),
      concat(sigBits: _*).as("bucket"),
      quant(col("embedding")).as("v"))
    val l = d.select(col("vec_id").as("id_l"), col("bucket"),
      col("v").as("v_l"))
    val r = d.select(col("vec_id").as("id_r"), col("bucket"),
      col("v").as("v_r"))
    l.join(r, "bucket").filter(col("id_l") < col("id_r"))
      .withColumn("cosine", cosineQ(col("v_l"), col("v_r")))
      .filter(col("cosine") >= threshold)
      .select("id_l", "id_r", "cosine")
  }

  def lshNearDupSql(bits: Int = 8, threshold: Double = 0.2): String = {
    val bucket = (1 to bits).map(i =>
      s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""bucketed AS (
       |  SELECT vec_id, $bucket AS bucket, $quantSql AS v
       |  FROM embeddings
       |)
       |SELECT l.vec_id AS id_l, r.vec_id AS id_r,
       |  floor(list_sum(list_transform(list_zip(l.v, r.v),
       |          p -> p[1] * p[2])) /
       |    greatest(sqrt(list_sum(list_transform(l.v, x -> x * x))) *
       |             sqrt(list_sum(list_transform(r.v, x -> x * x))), 1e-12)
       |    * 10000.0) / 10000.0 AS cosine
       |FROM bucketed l JOIN bucketed r
       |  ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |WHERE floor(list_sum(list_transform(list_zip(l.v, r.v),
       |          p -> p[1] * p[2])) /
       |    greatest(sqrt(list_sum(list_transform(l.v, x -> x * x))) *
       |             sqrt(list_sum(list_transform(r.v, x -> x * x))), 1e-12)
       |    * 10000.0) / 10000.0 >= $threshold""".stripMargin
  }
}

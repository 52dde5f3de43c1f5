package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF cosine similarity between paired documents — the third leg of
  * the north star's similarity vector (JW / Levenshtein / TF-IDF
  * cosine). Sparse formulation, no dense vectors:
  *
  *   tokens:  records → explode(full_text tokens) → (id, token, tf)
  *   idf:     per token, floor((ln((N+1)/(df+1)) + 1) · 4096) — an
  *            INTEGER grid, so tf·idf weights are integer-valued and
  *            dot products / norms are EXACT in double arithmetic
  *            (order-independent ⇒ engine-portable, same trick as the
  *            embedding ops)
  *   dot:     pairs ⋈ weights(id_l) ⋈ weights(id_r) on token —
  *            only SHARED tokens contribute; group-by pair
  *   cosine:  dot / (norm_l · norm_r), floor-quantized to 1e-4
  *
  * Scale: two shuffles on token (idf + the pair-token join) and one on
  * pair id. The token join is skew-prone on stopword-ish tokens — the
  * same hot-key concern as blocking; here the synthetic vocabulary is
  * tiny so every token is hot, which makes this op the stress test for
  * the pattern.
  */
object TfIdf {

  /** (id, token, weight, norm) with integer-grid weights. */
  private def weights(records: DataFrame, idCol: String,
                      textCol: String): (DataFrame, DataFrame) = {
    val toks = records.select(col(idCol).as("id"),
        explode(filter(split(col(textCol), " "), w => w =!= ""))
          .as("token"))
      .groupBy("id", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
    val n = records.count().toDouble
    val idf = toks.groupBy("token")
      .agg(countDistinct(col("id")).cast("double").as("df"))
      .withColumn("idf",
        floor((log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0) * 4096.0))
      .select("token", "idf")
    val w = toks.join(idf, "token")
      .withColumn("w", col("tf") * col("idf"))
      .select("id", "token", "w")
    val norms = w.groupBy("id")
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    (w, norms)
  }

  /** (id_l, id_r, tfidf_cos) for the given pairs. */
  def cosine(pairs: DataFrame, records: DataFrame,
             idCol: String = "conv_id",
             textCol: String = "full_text"): DataFrame = {
    val (w, norms) = weights(records, idCol, textCol)
    val dots = pairs
      .join(w.select(col("id").as("id_l"), col("token"),
        col("w").as("w_l")), "id_l")
      .join(w.select(col("id").as("id_r"), col("token"),
        col("w").as("w_r")), Seq("id_r", "token"))
      .groupBy("id_l", "id_r")
      .agg(sum(col("w_l") * col("w_r")).as("dot"))
    pairs
      .join(dots, Seq("id_l", "id_r"), "left")
      .join(norms.select(col("id").as("id_l"), col("norm").as("n_l")), "id_l")
      .join(norms.select(col("id").as("id_r"), col("norm").as("n_r")), "id_r")
      .select(col("id_l"), col("id_r"),
        (floor(coalesce(col("dot"), lit(0.0)) /
          greatest(col("n_l") * col("n_r"), lit(1.0e-12)) * 10000.0) / 10000.0)
          .as("tfidf_cos"))
  }

  /** DuckDB mirror over CTEs `normalized` + `pairs`. */
  val oracleCtes: String =
    """toks AS (
      |  SELECT conv_id AS id, unnest(list_filter(
      |    string_split(full_text, ' '), w -> w != '')) AS token
      |  FROM normalized
      |),
      |tf AS (
      |  SELECT id, token, CAST(count(*) AS DOUBLE) AS tf
      |  FROM toks GROUP BY id, token
      |),
      |idf AS (
      |  SELECT token,
      |    floor((ln(((SELECT count(*) FROM normalized) + 1.0) /
      |      (CAST(count(DISTINCT id) AS DOUBLE) + 1.0)) + 1.0) * 4096.0)
      |      AS idf
      |  FROM tf GROUP BY token
      |),
      |wts AS (
      |  SELECT id, tf.token, tf * idf AS w FROM tf JOIN idf ON tf.token = idf.token
      |),
      |norms AS (
      |  SELECT id, sqrt(sum(w * w)) AS norm FROM wts GROUP BY id
      |),
      |dots AS (
      |  SELECT p.id_l, p.id_r, sum(a.w * b.w) AS dot
      |  FROM pairs p
      |  JOIN wts a ON a.id = p.id_l
      |  JOIN wts b ON b.id = p.id_r AND b.token = a.token
      |  GROUP BY p.id_l, p.id_r
      |)""".stripMargin

  val oracleSelect: String =
    """SELECT p.id_l, p.id_r,
      |  floor(coalesce(d.dot, 0.0) /
      |    greatest(nl.norm * nr.norm, 1e-12) * 10000.0) / 10000.0 AS tfidf_cos
      |FROM pairs p
      |LEFT JOIN dots d ON p.id_l = d.id_l AND p.id_r = d.id_r
      |JOIN norms nl ON nl.id = p.id_l
      |JOIN norms nr ON nr.id = p.id_r""".stripMargin
}

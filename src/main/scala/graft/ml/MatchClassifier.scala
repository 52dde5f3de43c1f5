package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Match classifier (reference M2/M3: sklearn RandomForest behind a
  * FastAPI HTTP hop, oagdedupe fastapi/fapi.py:161-184 + orm.py:251-288
  * 50k-row chunked HTTP scoring). Rebuilt as spark.ml
  * LogisticRegression (the north star names logistic) — training is one
  * job on the tiny labeled set, scoring is ONE distributed
  * `model.transform` pass with no chunking and no HTTP hops.
  */
object MatchClassifier {

  /** Train on labeled pairs carrying feature columns + `label`. */
  def train(labeledFeatures: DataFrame, featureCols: Seq[String]): LogisticRegressionModel = {
    val assembled = assemble(labeledFeatures, featureCols)
    new LogisticRegression()
      .setMaxIter(100)
      .setRegParam(0.0)
      .setLabelCol("label")
      .setFeaturesCol("features")
      .fit(assembled)
  }

  /** Model persistence (reference fapi.py:161-176 joblib dump +
    * cached-model reload): load the committed model at `path` if one
    * exists, otherwise train on `labeledFeatures` (lazily built — a
    * resumed run never constructs the training set) and save.
    */
  def trainOrLoad(path: Option[String], featureCols: Seq[String])
                 (labeledFeatures: => DataFrame): LogisticRegressionModel =
    path match {
      case Some(p) if committed(p) => LogisticRegressionModel.load(p)
      case Some(p) =>
        val m = train(labeledFeatures, featureCols)
        m.write.overwrite().save(p)
        m
      case None => train(labeledFeatures, featureCols)
    }

  /** spark.ml's writer commits metadata last; its _SUCCESS marker is
    * the load-safe signal (same convention as TableIO stages). */
  private def committed(path: String): Boolean =
    Files.exists(Paths.get(path, "metadata", "_SUCCESS"))

  /** Score candidate pairs → (id_l, id_r, score) with score =
    * P(match). Replaces reference scores table (tables.py:302-314).
    * Probability extraction via the vector_to_array builtin — no
    * bespoke UDF in the full-corpus scoring projection.
    */
  def score(model: LogisticRegressionModel, pairFeatures: DataFrame,
            featureCols: Seq[String]): DataFrame =
    model.transform(assemble(pairFeatures, featureCols))
      .select(col("id_l"), col("id_r"),
        vector_to_array(col("probability")).getItem(1).as("score"))

  private def assemble(df: DataFrame, featureCols: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .transform(df)

  /** O4: uncertainty sampling — the reference's active-learning query
    * step (modAL uncertainty_sampling, fapi.py:98-113): the k pairs
    * whose score is closest to 0.5.
    */
  def uncertaintyTopK(scored: DataFrame, kInstances: Int = 10): DataFrame =
    scored.orderBy(abs(col("score") - 0.5), col("id_l"), col("id_r"))
      .limit(kInstances)
}

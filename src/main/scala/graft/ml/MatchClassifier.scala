package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Score candidate pairs → (id_l, id_r, score) with score =
    * P(match). Replaces reference scores table (tables.py:302-314).
    */
  def score(model: LogisticRegressionModel, pairFeatures: DataFrame,
            featureCols: Seq[String]): DataFrame = {
    val p1 = udf((v: Vector) => v(1))
    model.transform(assemble(pairFeatures, featureCols))
      .select(col("id_l"), col("id_r"),
        p1(col("probability")).as("score"))
  }

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

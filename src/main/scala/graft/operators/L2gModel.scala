package graft.operators

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locus-to-gene scoring with Spark ML's gradient-boosted trees — the
  * distributed counterpart of the reference's driver-side sklearn model
  * (reference: method/l2g/model.py:58-229, trainer method/l2g/trainer.py).
  *
  * Training and scoring both stay on the cluster: no toPandas round trip, no
  * Python worker. Model I/O uses Spark ML's native format (the reference's
  * skops artefacts are sklearn-specific and out of parity scope, SURVEY §7.3).
  */
object L2gModel {

  /** Train a GBT classifier on a long-format gold-standard feature matrix.
    *
    * @param featureMatrix wide frame with `goldStandardSet` label (0/1) and
    *                      one column per feature
    */
  def train(
      featureMatrix: DataFrame,
      featureCols: Seq[String],
      labelCol: String = "goldStandardSet",
      maxIter: Int = 20,
      maxDepth: Int = 5
  ): GBTClassificationModel = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(featureMatrix)
    new GBTClassifier()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(42)
      .fit(assembled)
  }

  /** Score a feature matrix: appends the positive-class probability as
    * `score` (method/l2g/model.py:197-229 semantics).
    */
  def score(
      model: GBTClassificationModel,
      featureMatrix: DataFrame,
      featureCols: Seq[String]
  ): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(featureMatrix)
    model
      .transform(assembled)
      .withColumn("score", vector_to_array(col("probability")).getItem(1))
      .drop("features", "rawPrediction", "probability", "prediction")
  }
}

package graft.operators

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
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

  /** Evaluation metrics for a scored matrix (method/l2g/trainer.py:196-260):
    * area under ROC and average precision (area under the PR curve),
    * computed cluster-side with Spark ML evaluators — no sklearn round trip.
    */
  def evaluate(
      scored: DataFrame,
      labelCol: String = "goldStandardSet",
      scoreCol: String = "score"
  ): Map[String, Double] = {
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = scored.withColumn(
      "_rawScore",
      array_to_vector(array(lit(1.0) - col(scoreCol), col(scoreCol))))
    def metric(name: String): Double =
      new BinaryClassificationEvaluator()
        .setLabelCol(labelCol)
        .setRawPredictionCol("_rawScore")
        .setMetricName(name)
        .evaluate(prepared)
    Map(
      "areaUnderROC" -> metric("areaUnderROC"),
      "averagePrecision" -> metric("areaUnderPR"))
  }

  /** K-fold cross-validated training with a small hyperparameter sweep
    * (method/l2g/trainer.py:273-380, which wraps sklearn GridSearchCV):
    * Spark ML `CrossValidator` over maxDepth × maxIter, folds and model
    * selection evaluated on the cluster.
    */
  def trainWithCv(
      featureMatrix: DataFrame,
      featureCols: Seq[String],
      labelCol: String = "goldStandardSet",
      numFolds: Int = 5,
      maxDepthGrid: Seq[Int] = Seq(3, 5),
      maxIterGrid: Seq[Int] = Seq(10, 20)
  ): GBTClassificationModel = {
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(featureMatrix)
    val gbt = new GBTClassifier()
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setSeed(42)
    val grid = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, maxDepthGrid)
      .addGrid(gbt.maxIter, maxIterGrid)
      .build()
    val cv = new CrossValidator()
      .setEstimator(gbt)
      .setEvaluator(
        new BinaryClassificationEvaluator()
          .setLabelCol(labelCol)
          .setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setParallelism(4)
      .setSeed(42)
    cv.fit(assembled).bestModel.asInstanceOf[GBTClassificationModel]
  }

  /** Leakage-aware hierarchical train/test split
    * (method/l2g/trainer.py:507-630 `hierarchical_split`): gold-standard
    * rows must not leak a studyLocusId (or, transitively, a gene's loci)
    * across the split, or evaluation scores are inflated.
    *
    *   1. POSITIVE rows' genes are split train/test. The reference shuffles
    *      with sklearn's RNG; here the assignment is a deterministic
    *      md5-hash fraction of the geneId — the same split on every run and
    *      engine, with no driver-side gene list.
    *   2. A studyLocusId reachable from both sides is assigned to TRAIN and
    *      removed from test (the reference's overlap rule).
    *   3. Negatives follow their studyLocusId.
    *
    * All set logic is semi-join shaped (distinct loci per side + left-semi
    * membership), so the split runs at any corpus size.
    *
    * @return (train, test)
    */
  def hierarchicalSplit(
      goldStandard: DataFrame,
      testSize: Double = 0.15,
      labelCol: String = "goldStandardSet"
  ): (DataFrame, DataFrame) = {
    val u = conv(substring(md5(col("geneId").cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val positives = goldStandard.filter(col(labelCol) === 1)
    val geneSide = positives
      .select("geneId").distinct()
      .withColumn("inTest", u < lit(testSize))
    val trainLoci = positives
      .join(geneSide.filter(!col("inTest")), Seq("geneId"), "left_semi")
      .select("studyLocusId").distinct()
    val testLoci = positives
      .join(geneSide.filter(col("inTest")), Seq("geneId"), "left_semi")
      .select("studyLocusId").distinct()
      // overlap rule: loci seen from both sides stay in train
      .except(trainLoci)
    (
      goldStandard.join(trainLoci, Seq("studyLocusId"), "left_semi"),
      goldStandard.join(testLoci, Seq("studyLocusId"), "left_semi"))
  }

  /** Persist a trained model together with its feature-name contract
    * (method/l2g/model.py:230-250 save; the reference's skops artefact is
    * replaced by Spark ML native persistence, which distributes the tree
    * ensemble as parquet). The sidecar `features.json` records the exact
    * assembler column order — scoring with a different feature list or
    * order would silently permute the vector, so [[load]] verifies it.
    * Hadoop FS APIs are used throughout, so `path` may be any supported
    * scheme (local, HDFS, object store).
    */
  def save(
      spark: org.apache.spark.sql.SparkSession,
      model: GBTClassificationModel,
      featureCols: Seq[String],
      path: String
  ): Unit = {
    model.write.overwrite().save(s"$path/classifier")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/features.json"), true)
    try out.write(
      featureCols
        .map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a persisted model and its feature contract
    * (method/l2g/model.py:252-325 load_from_disk). When `expectedFeatures`
    * is given, a name-or-order mismatch fails fast instead of producing
    * silently permuted scores.
    */
  def load(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      expectedFeatures: Seq[String] = Seq.empty
  ): (GBTClassificationModel, Seq[String]) = {
    val model = GBTClassificationModel.load(s"$path/classifier")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/features.json"))
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // Minimal parse of the flat string array written by save().
    val features = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toSeq
    if (expectedFeatures.nonEmpty && features != expectedFeatures)
      throw new IllegalArgumentException(
        s"Persisted model was trained on features [${features.mkString(", ")}] " +
          s"but [${expectedFeatures.mkString(", ")}] requested")
    (model, features)
  }

  /** Flattened decision-tree node: `featureIndex = -1` marks a leaf. */
  final case class FlatNode(
      featureIndex: Int, threshold: Double, left: Int, right: Int, prediction: Double)

  private def flattenTree(root: Node): Array[FlatNode] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[FlatNode]
    def walk(n: Node): Int = {
      val idx = buf.length
      buf += FlatNode(-1, 0.0, -1, -1, n.prediction) // placeholder
      n match {
        case in: InternalNode =>
          val split = in.split match {
            case cs: ContinuousSplit => cs
            case other =>
              throw new IllegalArgumentException(
                s"only continuous splits supported, got $other")
          }
          val l = walk(in.leftChild)
          val r = walk(in.rightChild)
          buf(idx) = FlatNode(split.featureIndex, split.threshold, l, r, in.prediction)
        case _: LeafNode => ()
      }
      idx
    }
    walk(root)
    buf.toArray
  }

  /** Distributed per-feature attribution for GBT scores — the cluster-side
    * counterpart of the reference's driver-side SHAP explainer
    * (dataset/l2g_prediction.py:180-304, which `toPandas()`es the full
    * matrix). Per row and tree, the decision path is replayed and each
    * split's change in node prediction is credited to the split feature
    * (Saabas path attribution); summed over trees with their boosting
    * weights the contributions are ADDITIVE-EXACT in margin space:
    * `margin = baseValue + Σ contributions`, `score = σ(2·margin)`.
    * The flattened trees ship to executors once (broadcast via the UDF
    * closure — a few KB), so explanation scales with rows, not driver
    * memory. Unlike interventional SHAP the attribution is path-local, but
    * it needs no background sample and is deterministic.
    *
    * Output: the input columns + `score`, `shapBaseValue` and a `features`
    * array of (name, value, shapValue) structs, mirroring the reference's
    * schema.
    */
  def explain(
      model: GBTClassificationModel,
      featureMatrix: DataFrame,
      featureCols: Seq[String]
  ): DataFrame = {
    val trees = model.trees.map(t => flattenTree(t.rootNode))
    val weights = model.treeWeights
    val nFeatures = featureCols.size
    val contribUdf = udf { feats: Seq[Double] =>
      val contrib = Array.fill(nFeatures)(0.0)
      var base = 0.0
      var t = 0
      while (t < trees.length) {
        val nodes = trees(t)
        val w = weights(t)
        base += w * nodes(0).prediction
        var i = 0
        while (nodes(i).featureIndex >= 0) {
          val n = nodes(i)
          val next = if (feats(n.featureIndex) <= n.threshold) n.left else n.right
          contrib(n.featureIndex) += w * (nodes(next).prediction - n.prediction)
          i = next
        }
        t += 1
      }
      (base, contrib.toSeq)
    }
    val featsArr = array(featureCols.map(c => coalesce(col(c).cast("double"), lit(0.0))): _*)
    val withContrib = featureMatrix
      .withColumn("_expl", contribUdf(featsArr))
      .withColumn("shapBaseValue", col("_expl._1"))
      .withColumn("_contrib", col("_expl._2"))
    val featureStructs = featureCols.zipWithIndex.map { case (name, i) =>
      struct(
        lit(name).as("name"),
        coalesce(col(name).cast("double"), lit(0.0)).as("value"),
        col("_contrib").getItem(i).as("shapValue"))
    }
    val margin = col("shapBaseValue") +
      aggregate(col("_contrib"), lit(0.0), (acc, x) => acc + x)
    withContrib
      .withColumn("features", array(featureStructs: _*))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(lit(-2.0) * margin)))
      .drop("_expl", "_contrib")
  }
}

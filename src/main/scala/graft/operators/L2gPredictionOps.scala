package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** L2GPrediction post-processing (reference: dataset/l2g_prediction.py).
  * Scoring and explanation live in [[L2gModel]]; these are the relational
  * steps around them.
  */
object L2gPredictionOps {

  /** Predictions → Open Targets disease-target evidence
    * (l2g_prediction.py:108-179): threshold, join credible sets for
    * studyId, join the study index for diseases / publication metadata,
    * explode the diseases.
    */
  def toDiseaseTargetEvidence(
      predictions: DataFrame,
      studyLoci: DataFrame,
      studyIndex: DataFrame,
      l2gThreshold: Double = 0.05
  ): DataFrame = {
    val si0 = Seq("publicationDate", "pubmedId").foldLeft(studyIndex) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }
    predictions
      .filter(col("score") >= l2gThreshold)
      .join(studyLoci.select("studyLocusId", "studyId"), Seq("studyLocusId"), "inner")
      .join(
        si0.select(
          col("studyId"),
          col("diseaseIds"),
          when(col("publicationDate").rlike("\\d{4}-\\d{2}-\\d{2}"), col("publicationDate"))
            .as("curationDate"),
          when(col("pubmedId").isNotNull, array(col("pubmedId"))).as("literature")),
        Seq("studyId"),
        "inner")
      .select(
        lit("genetic_association").as("datatypeId"),
        lit("gwas_credible_sets").as("datasourceId"),
        col("geneId").as("targetFromSourceId"),
        explode(col("diseaseIds")).as("diseaseFromSourceMappedId"),
        col("score").as("resourceScore"),
        col("curationDate"),
        col("studyLocusId"),
        col("literature"))
  }

  /** Attach the feature vector used for a prediction as an array of
    * (name, value) structs (l2g_prediction.py:304-360).
    */
  def addFeatures(
      predictions: DataFrame,
      featureMatrix: DataFrame,
      featureCols: Seq[String]
  ): DataFrame = {
    val structs = featureCols.map(c =>
      struct(lit(c).as("name"), col(c).cast("float").as("value")))
    predictions
      .drop("features")
      .join(
        featureMatrix.select(
          (Seq(col("studyLocusId"), col("geneId")) ++ featureCols.map(col)): _*),
        Seq("studyLocusId", "geneId"),
        "left")
      .withColumn("features", array(structs: _*))
      .drop(featureCols: _*)
  }
}

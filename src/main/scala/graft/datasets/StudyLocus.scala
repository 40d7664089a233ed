package graft.datasets

import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{GDataset, GDataset => GD}

/** Credible sets / clumped associations
  * (reference: dataset/study_locus.py:152+; QC flags :62-150).
  */
final case class StudyLocus(df: DataFrame) extends GDataset[StudyLocus] {
  override def schemaName: String = "study_locus"
  override protected def withDf(newDf: DataFrame): StudyLocus = copy(df = newDf)

  override def qcColumnName: Option[String] = Some("qualityControls")

  /** Flag key → flag text, mirroring StudyLocusQualityCheck
    * (dataset/study_locus.py:84-150) for the flags this engine emits.
    */
  override def qcMappings: Map[String, String] = StudyLocus.QualityChecks

  /** Keep tag variants inside the given credible interval
    * (dataset/study_locus.py:803-824).
    */
  def filterCredibleSet(credibleInterval: String = "is95CredibleSet"): StudyLocus =
    withDf(
      df.withColumn("locus", functions.filter(col("locus"), tag => tag.getField(credibleInterval)))
    )

  /** Prune the LD set by r² threshold (dataset/study_locus.py:826-843). */
  def filterLdSet(r2Threshold: Double): StudyLocus =
    withDf(
      df.withColumn(
        "ldSet",
        functions.filter(col("ldSet"), tag => tag.getField("r2Overall") >= r2Threshold)
      )
    )

  /** Replace studyType with the study index's type LUT — a bounded
    * two-column broadcast left join (dataset/study_locus.py:233-249 +
    * study_index.py:226-232 study_type_lut).
    */
  def annotateStudyType(studyIndex: DataFrame): StudyLocus =
    withDf(
      df.drop("studyType").join(
        broadcast(studyIndex.select("studyId", "studyType")),
        Seq("studyId"),
        "left"))
}

object StudyLocus {

  val QualityChecks: Map[String, String] = Map(
    "WINDOW_CLUMPED" -> "Explained by a more significant variant in the same window",
    "SUBSIGNIFICANT_FLAG" -> "Subsignificant p-value",
    "LD_CLUMPED" -> "Explained by a more significant variant in high LD",
    "DUPLICATED_STUDYLOCUS_FLAG" -> "Non-unique study locus",
    "AMBIGUOUS_STUDY" -> "Association with ambiguous study",
    "MISSING_STUDY" -> "Study not found in the study index"
  )

  /** md5-based studyLocusId (dataset/study_locus.py:627-650). */
  def assignStudyLocusId(uniquenessDefiningColumns: Seq[String]) =
    GD.generateIdentifier(uniquenessDefiningColumns).alias("studyLocusId")

  /** Schema-enforced parquet load (dataset/dataset.py:167-220). */
  def fromParquet(spark: SparkSession, path: String): StudyLocus =
    StudyLocus(GD.readParquet(spark, "study_locus", path))
}

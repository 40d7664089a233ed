package graft.datasets

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{GDataset, GDataset => GD}

/** Typed wrappers for the remaining core index datasets — schema-validated
  * construction plus the dataset-level operations the reference exposes
  * (dataset/study_index.py, variant_index.py, target_index.py, ld_index.py,
  * colocalisation.py, study_locus_overlap.py, biosample_index.py).
  */
final case class StudyIndex(df: DataFrame) extends GDataset[StudyIndex] {
  override def schemaName: String = "study_index"
  override protected def withDf(newDf: DataFrame): StudyIndex = copy(df = newDf)

  /** Restrict to QTL studies (any non-gwas study type). */
  def qtlStudies: StudyIndex = filter(col("studyType") =!= "gwas")
}

object StudyIndex {
  def fromParquet(spark: SparkSession, path: String): StudyIndex =
    StudyIndex(GD.readParquet(spark, "study_index", path))
}

final case class VariantIndex(df: DataFrame) extends GDataset[VariantIndex] {
  override def schemaName: String = "variant_index"
  override protected def withDf(newDf: DataFrame): VariantIndex = copy(df = newDf)

  /** Keep only variants present in the given frame — semi join, never a
    * collected id list (dataset/variant_index.py:228-252).
    */
  def filterByVariant(variants: DataFrame, idCol: String = "variantId"): VariantIndex =
    withDf(df.join(variants.select(col(idCol)).distinct(), Seq("variantId"), "semi"))
}

object VariantIndex {
  def fromParquet(spark: SparkSession, path: String): VariantIndex =
    VariantIndex(GD.readParquet(spark, "variant_index", path))
}

final case class TargetIndex(df: DataFrame) extends GDataset[TargetIndex] {
  override def schemaName: String = "target_index"
  override protected def withDf(newDf: DataFrame): TargetIndex = copy(df = newDf)

  /** Keep approved biotypes (dataset/target_index.py:36-46). */
  def filterByBiotypes(biotypes: Seq[String]): TargetIndex =
    filter(col("biotype").isin(biotypes: _*))

  /** Gene location lookup table (dataset/target_index.py:48-60). */
  def locationsLut: DataFrame =
    df.select(
      col("id").as("geneId"),
      col("genomicLocation.chromosome").as("chromosome"),
      col("genomicLocation.start").as("start"),
      col("genomicLocation.end").as("end"),
      col("tss")
    )

  /** Gene-symbol lookup table covering approved AND obsoleted symbols
    * (dataset/target_index.py:63-79).
    */
  def symbolsLut: DataFrame =
    df.select(
      F.explode(
        F.array_union(F.array(col("approvedSymbol")), col("obsoleteSymbols.label")))
        .as("geneSymbol"),
      col("id").as("geneId"),
      col("genomicLocation.chromosome").as("chromosome"),
      col("tss"))

  /** Gene TSS LUT with the reference's fallback priority: preferred tss →
    * canonical-transcript start/end by strand → genomic-location start/end
    * by strand (dataset/target_index.py:135-158).
    */
  def tssLut: DataFrame = {
    val ctTss = F
      .when(col("canonicalTranscript.strand") === "+", col("canonicalTranscript.start"))
      .when(col("canonicalTranscript.strand") === "-", col("canonicalTranscript.end"))
    val glTss = F
      .when(col("genomicLocation.strand") === 1, col("genomicLocation.start"))
      .when(col("genomicLocation.strand") === -1, col("genomicLocation.end"))
    df.select(
      col("id").as("geneId"),
      F.coalesce(col("tss"), ctTss, glTss).cast("long").as("tss"))
  }

  /** geneId ↔ UniProt proteinId LUT with PAR (pseudo-autosomal region)
    * dedup: a protein carried by both X and Y keeps only the
    * `includeParChr` copy (dataset/target_index.py:81-133).
    */
  def proteinIdLut(includeParChr: String = "X"): DataFrame = {
    require(
      includeParChr == "X" || includeParChr == "Y",
      s"include_par_chr must be either 'X' or 'Y', got $includeParChr")
    val base = df
      .select(
        col("id").as("geneId"),
        F.explode(col("proteinIds")).as("p"),
        col("canonicalTranscript.chromosome").as("chromosome"))
      .select(col("geneId"), col("p.id").as("proteinId"), col("chromosome"))
    // PAR protein = its chromosome set is exactly {X, Y}: a tiny
    // map-side-combinable aggregate joined back on the protein key (the PAR
    // side is a handful of proteins → broadcastable), instead of a
    // whole-partition window sorting the LUT and copying the set array into
    // every row.
    // Null proteinIds can never match the left join below (SQL null-key
    // semantics), so they'd silently pass the PAR filter; drop them from
    // the aggregate explicitly — a null-id "protein" has no PAR identity.
    val parProteins = base
      .filter(col("proteinId").isNotNull)
      .groupBy(col("proteinId"))
      .agg(F.concat_ws(",", F.sort_array(F.collect_set(col("chromosome")))).as("chromSet"))
      .filter(col("chromSet") === "X,Y")
      .select(col("proteinId"), F.lit(true).as("isPAR"))
    base
      .join(F.broadcast(parProteins), Seq("proteinId"), "left")
      .filter(!(F.coalesce(col("isPAR"), F.lit(false)) && !col("chromosome").isin(includeParChr)))
      .drop("isPAR", "chromosome")
  }
}

object TargetIndex {
  def fromParquet(spark: SparkSession, path: String): TargetIndex =
    TargetIndex(GD.readParquet(spark, "target_index", path))
}

/** pQTL study index → StudyIndex conversion
  * (dataset/study_index.py:885-936 ProteinQuantitativeTraitLocusStudyIndex
  * .to_study): explode `targetsFromSource` to one study row per target,
  * resolve the gene symbol through the (bounded, broadcast) symbol LUT
  * preferring any curated geneId, and re-resolve symbols whose mapping is
  * ambiguous (>1 distinct geneId) through the UniProt protein-id LUT.
  */
object PqtlStudyIndex {

  def toStudy(pqtl: DataFrame, symbolLut: DataFrame, proteinLut: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val outCols = pqtl.columns.toSeq.filterNot(c => c == "targetsFromSource" || c == "geneId")
    val exploded = pqtl
      .withColumn("t", explode(col("targetsFromSource")))
      .select(
        outCols.map(col) ++ Seq(
          col("t.geneId").as("geneIdFromSource"),
          col("t.geneSymbol").as("geneSymbol"),
          col("t.proteinId").as("proteinId")): _*)
    val symAnnotated = exploded
      .join(broadcast(symbolLut.select("geneSymbol", "geneId")), Seq("geneSymbol"), "left")
      .withColumn("geneId", coalesce(col("geneIdFromSource"), col("geneId")))
      .withColumn(
        "ambiguousGeneIdMapping",
        // >1 distinct non-null geneId ⇔ min ≠ max: constant window state,
        // no per-row set array over the symbol group.
        coalesce(
          min(col("geneId")).over(Window.partitionBy("geneSymbol")) =!=
            max(col("geneId")).over(Window.partitionBy("geneSymbol")),
          lit(false)))
    val out = outCols :+ "geneId"
    val nonAmbiguous = symAnnotated
      .filter(!col("ambiguousGeneIdMapping"))
      .select(out.map(col): _*)
    val ambiguous = symAnnotated
      .filter(col("ambiguousGeneIdMapping"))
      .drop("geneId")
      .join(broadcast(proteinLut.select("proteinId", "geneId")), Seq("proteinId"), "left")
      .select(out.map(col): _*)
    nonAmbiguous.unionByName(ambiguous)
  }
}

final case class LdIndex(df: DataFrame) extends GDataset[LdIndex] {
  override def schemaName: String = "ld_index"
  override protected def withDf(newDf: DataFrame): LdIndex = copy(df = newDf)
}

object LdIndex {
  def fromParquet(spark: SparkSession, path: String): LdIndex =
    LdIndex(GD.readParquet(spark, "ld_index", path))
}

final case class Colocalisations(df: DataFrame) extends GDataset[Colocalisations] {
  override def schemaName: String = "colocalisation"
  override protected def withDf(newDf: DataFrame): Colocalisations = copy(df = newDf)

  /** Strongest colocalisation per (credible set, gene) by the method metric
    * (dataset/colocalisation.py:37-129).
    */
  def maxPerGene(metric: String): DataFrame =
    graft.operators.QcJoins.colocMaxPerGene(df, metric)
}

final case class StudyLocusOverlaps(df: DataFrame) extends GDataset[StudyLocusOverlaps] {
  override def schemaName: String = "study_locus_overlap"
  override protected def withDf(newDf: DataFrame): StudyLocusOverlaps = copy(df = newDf)

  def calculateBetaRatio: DataFrame = graft.operators.Overlaps.calculateBetaRatio(df)
}

package graft.datasets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.GDataset

/** Typed wrappers for the remaining declared datasets — every schema in the
  * registry has a constructible, validating wrapper so the full 21-dataset
  * surface of the reference is addressable (reference: the dataset package).
  */
final case class IntervalsDs(df: DataFrame) extends GDataset[IntervalsDs] {
  override def schemaName: String = "intervals"
  override protected def withDf(newDf: DataFrame): IntervalsDs = copy(df = newDf)
}

final case class PairwiseLd(df: DataFrame) extends GDataset[PairwiseLd] {
  override def schemaName: String = "pairwise_ld"
  override protected def withDf(newDf: DataFrame): PairwiseLd = copy(df = newDf)
}

final case class BiosampleIndex(df: DataFrame) extends GDataset[BiosampleIndex] {
  override def schemaName: String = "biosample_index"
  override protected def withDf(newDf: DataFrame): BiosampleIndex = copy(df = newDf)
}

final case class SummaryStatisticsQc(df: DataFrame) extends GDataset[SummaryStatisticsQc] {
  override def schemaName: String = "summary_statistics_qc"
  override protected def withDf(newDf: DataFrame): SummaryStatisticsQc = copy(df = newDf)
}

final case class VariantDirection(df: DataFrame) extends GDataset[VariantDirection] {
  override def schemaName: String = "variant_direction"
  override protected def withDf(newDf: DataFrame): VariantDirection = copy(df = newDf)
}

final case class AminoAcidVariants(df: DataFrame) extends GDataset[AminoAcidVariants] {
  override def schemaName: String = "amino_acid_variants"
  override protected def withDf(newDf: DataFrame): AminoAcidVariants = copy(df = newDf)
}

final case class ContigIndex(df: DataFrame) extends GDataset[ContigIndex] {
  override def schemaName: String = "contig_index"
  override protected def withDf(newDf: DataFrame): ContigIndex = copy(df = newDf)

  /** Filter to the canonical chromosomes (dataset/contig_index.py:45-65). */
  def canonical(): ContigIndex =
    filter(col("id").isin(ContigIndex.CanonicalChromosomes: _*))
}

object ContigIndex {
  val CanonicalChromosomes: Seq[String] =
    (1 to 22).map(_.toString) ++ Seq("X", "Y", "MT")
}

final case class MolecularComplex(df: DataFrame) extends GDataset[MolecularComplex] {
  override def schemaName: String = "molecular_complex"
  override protected def withDf(newDf: DataFrame): MolecularComplex = copy(df = newDf)
}

final case class L2gFeature(df: DataFrame) extends GDataset[L2gFeature] {
  override def schemaName: String = "l2g_feature"
  override protected def withDf(newDf: DataFrame): L2gFeature = copy(df = newDf)
}

final case class L2gGoldStandard(df: DataFrame) extends GDataset[L2gGoldStandard] {
  override def schemaName: String = "l2g_gold_standard"
  override protected def withDf(newDf: DataFrame): L2gGoldStandard = copy(df = newDf)
}

final case class L2gPrediction(df: DataFrame) extends GDataset[L2gPrediction] {
  override def schemaName: String = "l2g_predictions"
  override protected def withDf(newDf: DataFrame): L2gPrediction = copy(df = newDf)
}

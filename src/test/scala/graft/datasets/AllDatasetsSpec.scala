package graft.datasets

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.core.{GDataset, SchemaRegistry}

/** Every declared schema has a typed wrapper whose validation accepts a
  * frame with exactly that schema — the full 21-dataset surface.
  */
class AllDatasetsSpec extends SparkSpec {

  private def empty(name: String) =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], SchemaRegistry(name))

  private lazy val wrappers: Map[String, org.apache.spark.sql.DataFrame => GDataset[_]] = Map(
    "summary_statistics" -> (SummaryStatistics(_)),
    "study_locus" -> (StudyLocus(_)),
    "study_index" -> (StudyIndex(_)),
    "variant_index" -> (VariantIndex(_)),
    "target_index" -> (TargetIndex(_)),
    "ld_index" -> (LdIndex(_)),
    "colocalisation" -> (Colocalisations(_)),
    "study_locus_overlap" -> (StudyLocusOverlaps(_)),
    "intervals" -> (IntervalsDs(_)),
    "pairwise_ld" -> (PairwiseLd(_)),
    "biosample_index" -> (BiosampleIndex(_)),
    "summary_statistics_qc" -> (SummaryStatisticsQc(_)),
    "variant_direction" -> (VariantDirection(_)),
    "amino_acid_variants" -> (AminoAcidVariants(_)),
    "contig_index" -> (ContigIndex(_)),
    "molecular_complex" -> (MolecularComplex(_)),
    "l2g_feature" -> (L2gFeature(_)),
    "l2g_gold_standard" -> (L2gGoldStandard(_)),
    "l2g_predictions" -> (L2gPrediction(_))
  )

  test("every dataset wrapper validates a frame with its declared schema") {
    wrappers.foreach { case (name, make) =>
      make(empty(name)).asInstanceOf[GDataset[_]]
      // validate() throws on mismatch; construction + validation must pass
      val ds = make(empty(name))
      ds.getClass.getMethod("validate").invoke(ds)
    }
  }

  test("wrapper coverage spans the registry (minus the raw VEP input schema)") {
    val covered = wrappers.keySet
    val expected = SchemaRegistry.names.toSet - "vep_json_output"
    assert(expected === covered)
  }
}

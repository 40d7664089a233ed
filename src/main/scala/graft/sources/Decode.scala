package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** deCODE proteomics summary-statistics helpers
  * (reference: datasource/decode/summary_statistics.py:146-210).
  */
object Decode {

  /** Study id from the raw file name: `<project>_Proteomics_...`. */
  def studyIdFromFile(projectId: Column, fileName: Column): Column =
    concat_ws("_", projectId, regexp_extract(fileName, "^.*/(Proteomics_.*)\\.txt\\.gz$", 1))

  /** Infer the effect allele frequency by comparing the imputed minor allele
    * frequency with the gnomAD European frequency: pick whichever of impMAF /
    * 1−impMAF the European AF is closer to; null EUR_AF falls back to impMAF
    * (doctest: (0.01, 0.02)→0.01, (0.01, 0.6)→0.99, (0.01, null)→0.01).
    */
  def inferAlleleFrequency(impMaf: Column, eurAf: Column): Column =
    when(eurAf.isNull, impMaf)
      .when(abs(eurAf - impMaf) <= abs(eurAf - (lit(1.0) - impMaf)), impMaf)
      .otherwise(lit(1.0) - impMaf)
}

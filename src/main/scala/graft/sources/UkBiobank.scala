package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.DataFrame

/** UKBiobank (SAIGE / Neale round 2) study-index harmoniser
  * (reference: datasource/ukbiobank/study_index.py:33-110): constants per
  * analysis family, PheCode trait recomposition, single-population
  * discovery-sample structure.
  */
object UkBiobank {

  def fromSource(ukbStudies: DataFrame): DataFrame = {
    val isSaige = col("code").startsWith("SAIGE_")
    val shaped = ukbStudies.select(
      col("code").as("studyId"),
      lit("UKBiobank").as("projectId"),
      lit("gwas").as("studyType"),
      col("trait").as("traitFromSource"),
      when(isSaige, "30104761").as("pubmedId"),
      when(
        isSaige,
        "Efficiently controlling for case-control imbalance and sample relatedness in large-scale genetic association studies")
        .otherwise(lit(null)).as("publicationTitle"),
      when(isSaige, "Wei Zhou").as("publicationFirstAuthor"),
      when(col("code").startsWith("NEALE2_"), "2018-08-01")
        .otherwise("2018-10-24").as("publicationDate"),
      when(isSaige, "Nature Genetics").as("publicationJournal"),
      col("n_total").cast("string").as("initialSampleSize"),
      col("n_cases").cast(IntegerType).as("nCases"),
      array(
        struct(
          col("n_total").cast(IntegerType).as("sampleSize"),
          concat(lit("European="), col("n_total")).as("ancestry")))
        .as("discoverySamples"),
      col("in_path").as("summarystatsLocation"),
      lit(true).as("hasSumstats"))
    shaped
      .withColumn(
        "traitFromSource",
        when(
          col("traitFromSource").contains(":"),
          concat(
            initcap(split(col("traitFromSource"), ": ").getItem(1)),
            lit(" | "),
            lower(split(col("traitFromSource"), ": ").getItem(0))))
          .otherwise(col("traitFromSource")))
      .withColumn(
        "ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(
          // The reference feeds the concatenated "European=<n>" label
          // straight into the LD-population map, which cannot resolve it
          // (null ldPopulation). This port strips the sample-count suffix
          // first so UKBiobank studies land on the nfe panel.
          transform(
            col("discoverySamples"),
            s =>
              struct(
                split(s.getField("ancestry"), "=").getItem(0).as("ancestry"),
                s.getField("sampleSize").as("sampleSize")))))
  }
}

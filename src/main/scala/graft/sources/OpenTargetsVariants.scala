package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.ArrayOps

/** Open Targets variant exports: VCF shaping for VEP, loss-of-function
  * curation and FoldX ΔΔG ingestion
  * (reference: datasource/open_targets/{variants,lof_curation,
  * foldex_integration}.py).
  */
object OpenTargetsVariants {

  /** Variants → VCF frame for annotation tools
    * (open_targets/variants.py:68-136): merge the direct and locus-carried
    * variant ids, split into VCF columns, keep clean ACGT alleles, global
    * sort. The rsID → coordinate remapping step of the reference calls the
    * Ensembl REST API and is intentionally out of scope.
    */
  def asVcf(variants: DataFrame): DataFrame = {
    val withLocus =
      if (variants.columns.contains("locus")) variants
      else
        variants.withColumn(
          "locus",
          lit(null).cast("array<struct<variantId:string>>"))
    val withRsId =
      if (withLocus.columns.contains("variantRsId")) withLocus
      else withLocus.withColumn("variantRsId", lit(null).cast(StringType))
    withRsId
      .filter(col("variantId").isNotNull)
      .withColumn(
        "variantId",
        explode(
          ArrayOps.safeArrayUnion(array(col("variantId")), col("locus.variantId"))))
      .select(
        coalesce(split(col("variantId"), "_").getItem(0), lit(".")).as("#CHROM"),
        coalesce(split(col("variantId"), "_").getItem(1), lit("."))
          .cast(IntegerType).as("POS"),
        coalesce(col("variantRsId"), lit(".")).as("ID"),
        coalesce(split(col("variantId"), "_").getItem(2), lit(".")).as("REF"),
        coalesce(split(col("variantId"), "_").getItem(3), lit(".")).as("ALT"),
        lit(".").as("QUAL"),
        lit(".").as("FILTER"),
        lit(".").as("INFO"))
      .distinct()
      .filter(
        col("#CHROM") =!= "." && col("POS").isNotNull &&
          col("REF").rlike("^[GCTA.]*$") && col("ALT").rlike("^[GCTA.]*$"))
      .orderBy(col("#CHROM").asc, col("POS").asc)
  }

  /** LoF verdict → human-readable description
    * (open_targets/lof_curation.py:41-59).
    */
  def lofDescription(verdict: Column): Column =
    concat(
      when(verdict === "lof", lit("Assessed to cause LoF"))
        .when(verdict === "likely_lof", lit("Suspected to cause LoF"))
        .when(verdict === "uncertain", lit("Uncertain LoF assessment"))
        .when(verdict === "likely_not_lof", lit("Suspected not to cause LoF"))
        .when(verdict === "not_lof", lit("Assessed not to cause LoF")),
      lit(" by OTAR2075 variant curation effort."))

  /** OTAR2075 LoF curation → variant-index rows
    * (open_targets/lof_curation.py:61-119): GRCh38 chrom/pos + GRCh37
    * ref/alt (the reference's lift-over caveat), verdict as a normalised
    * variantEffect entry.
    */
  def lofAsVariantIndex(lofDataset: DataFrame): DataFrame =
    lofDataset
      .select(
        split(col("Variant ID GRCh37"), "-").as("h37"),
        split(col("Variant ID GRCh38"), "-").as("h38"),
        col("Verdict"))
      .select(
        concat_ws(
          "_",
          col("h38").getItem(0), col("h38").getItem(1),
          col("h37").getItem(2), col("h37").getItem(3)).as("variantId"),
        col("h38").getItem(0).as("chromosome"),
        col("h38").getItem(1).cast(IntegerType).as("position"),
        col("h37").getItem(2).as("referenceAllele"),
        col("h37").getItem(3).as("alternateAllele"),
        array(
          struct(
            lit("LossOfFunctionCuration").as("method"),
            col("Verdict").as("assessment"),
            lit(null).cast(FloatType).as("score"),
            lit(null).cast(StringType).as("assessmentFlag"),
            lit(null).cast(StringType).as("targetId"))).as("variantEffect"),
        lofDescription(col("Verdict")).as("variantDescription"))
      .withColumn(
        "variantEffect",
        VariantEffectNormaliser.normaliseVariantEffect(col("variantEffect")))

  /** Variant → gene distance pairs from the transcript consequences
    * (dataset/variant_index.py:255-287).
    */
  def getDistanceToGene(
      variantIndex: DataFrame,
      distanceType: String = "distanceFromTss",
      maxDistance: Int = 500000
  ): DataFrame = {
    require(
      distanceType == "distanceFromTss" || distanceType == "distanceFromFootprint",
      s"invalid distance type: $distanceType")
    require(maxDistance <= 500000, s"max_distance must be <= 500000, got $maxDistance")
    val df = variantIndex
      .select(col("variantId"), explode(col("transcriptConsequences")).as("tc"))
      .select(col("variantId"), col("tc.targetId"), col(s"tc.$distanceType"))
    if (maxDistance == 500000) df else df.filter(col(distanceType) <= maxDistance)
  }

  /** Enrich variantEffect with amino-acid-level predictions (FoldX et al.):
    * extract the transcript-carried amino-acid change + UniProt accessions,
    * join the amino-acid annotation, union the predictor arrays, keep the
    * richest row per variant (dataset/variant_index.py:289-341).
    */
  def annotateWithAminoAcidConsequences(
      variantIndex: DataFrame,
      aminoAcidVariants: DataFrame
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("variantId")).orderBy(size(col("variantEffect")).desc)
    val aaChanging = filter(
      col("transcriptConsequences"),
      vep => vep.getField("aminoAcidChange").isNotNull)
    variantIndex
      .withColumn("aminoAcidChange", get(aaChanging, lit(0)).getField("aminoAcidChange"))
      .withColumn(
        "uniprotAccession",
        explode_outer(get(aaChanging, lit(0)).getField("uniprotAccessions")))
      .join(
        aminoAcidVariants.withColumnRenamed("variantEffect", "annotations"),
        Seq("uniprotAccession", "aminoAcidChange"),
        "left")
      .withColumn(
        "variantEffect",
        when(
          col("annotations").isNotNull,
          array_union(col("variantEffect"), col("annotations")))
          .otherwise(col("variantEffect")))
      .drop("uniprotAccession", "aminoAcidChange", "annotations")
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .drop("rank")
  }

  /** UniProt accessions where one structural position maps to several
    * sequence positions — un-disambiguatable, dropped
    * (foldex_integration.py:79-99).
    */
  def uniprotIdsToExclude(foldxInput: DataFrame): DataFrame =
    foldxInput
      .groupBy(col("protein_acc"), col("position"), col("wild_type"))
      .agg(collect_set(col("plddt")).as("plddts"))
      .filter(size(col("plddts")) > 1)
      .select(col("protein_acc"))
      .distinct()

  /** FoldX ΔΔG → amino-acid-variant rows with normalised energies
    * (foldex_integration.py:38-77).
    */
  def ingestFoldx(foldxInput: DataFrame, plddtThreshold: Double): DataFrame =
    foldxInput
      .filter(col("plddt") > plddtThreshold)
      .join(uniprotIdsToExclude(foldxInput), Seq("protein_acc"), "left_anti")
      .select(
        col("protein_acc").as("uniprotAccession"),
        concat(col("wild_type"), col("position"), col("mutated_type"))
          .as("aminoAcidChange"),
        struct(
          lit("FoldX").as("method"),
          lit(null).cast(StringType).as("assessment"),
          col("foldx_ddg").cast(FloatType).as("score"),
          lit(null).cast(StringType).as("assessmentFlag"),
          lit(null).cast(StringType).as("targetId")).as("foldx_prediction"))
      .groupBy(col("uniprotAccession"), col("aminoAcidChange"))
      .agg(collect_set(col("foldx_prediction")).as("variantEffect"))
      .withColumn(
        "variantEffect",
        VariantEffectNormaliser.normaliseVariantEffect(col("variantEffect")))
}

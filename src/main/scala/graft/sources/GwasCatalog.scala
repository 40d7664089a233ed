package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.{GenomicOps, Stats}

/** GWAS-Catalog association TSV harmonisation
  * (reference: datasource/gwas_catalog/associations.py): chromosome
  * normalisation, risk-allele parsing, p-value splitting, strand
  * (reverse-complement) and palindromic-allele handling, effect-direction
  * flipping, OR/CI → beta/standardError, QC flagging, EFO URI parsing.
  */
object GwasCatalog {

  // QC flag texts (reference: dataset/study_locus.py:91-96)
  val SubsignificantFlag = "Subsignificant p-value"
  val NoGenomicLocationFlag = "Incomplete genomic mapping"
  val CompositeFlag = "Composite association"
  val InconsistencyFlag = "Variant inconsistency"
  val NonMappedVariantFlag = "No mapping in GnomAd"
  val PalindromicAlleleFlag = "Palindrome alleles - cannot harmonize"

  /** Reverse complement of a DNA allele string; non-ACTG content (e.g. "?")
    * passes through unchanged (associations.py:460-496).
    */
  def reverseComplement(allele: Column): Column = {
    val up = upper(allele)
    when(up.rlike("[ACTG]+"), reverse(translate(up, "ACTG", "TGAC"))).otherwise(up)
  }

  /** "rs123-A-G" / "rs123-A; rs1235-G" → first listed risk allele
    * (associations.py:147-176).
    */
  def extractRiskAllele(riskAllele: Column): Column =
    split(split(riskAllele, "; ").getItem(0), "-").getItem(1)

  /** Risk allele concordance with the mapped ref/alt pair: direct match,
    * negative-strand match, ambiguous ("?") or unmapped rows all pass
    * (associations.py:393-457).
    */
  def isConcordant(riskAllele: Column, referenceAllele: Column, alternateAllele: Column): Column = {
    val rc = reverseComplement(riskAllele)
    when((riskAllele === referenceAllele) || (riskAllele === alternateAllele), lit(true))
      .when((rc === referenceAllele) || (rc === alternateAllele), lit(true))
      .when(riskAllele === "?", lit(true))
      .when(referenceAllele.isNull, lit(true))
      .otherwise(lit(false))
  }

  /** The effect refers to the reference allele (directly or via the negative
    * strand), so beta/OR must be flipped to the alternate-allele orientation
    * (associations.py:498-531).
    */
  def effectNeedsHarmonisation(riskAllele: Column, referenceAllele: Column): Column =
    (riskAllele === referenceAllele) ||
      (riskAllele === reverseComplement(referenceAllele))

  /** Palindromic ref/alt pair — strand cannot be resolved, effects are not
    * harmonisable (associations.py:533-568).
    */
  def areAllelesPalindromic(referenceAllele: Column, alternateAllele: Column): Column = {
    val rc = reverseComplement(alternateAllele)
    when(referenceAllele === rc, lit(true))
      .when(rc.isNull, lit(false))
      .otherwise(lit(false))
  }

  /** "beta" when the CI text mentions a direction, "odds_ratio" otherwise;
    * null CI → null (associations.py:925-958).
    */
  def effectType(ciText: Column): Column =
    when(
      lower(ciText).contains("increase") || lower(ciText).contains("decrease"),
      lit("beta")
    ).when(ciText.isNotNull, lit("odds_ratio"))

  /** Direction-harmonised beta: the sign flips when the allele orientation
    * and the reported direction disagree (associations.py:571-633).
    */
  def harmoniseBeta(effectSize: Column, ciText: Column, flippingNeeded: Column): Column =
    when(
      (flippingNeeded && ciText.contains("increase")) ||
        (!flippingNeeded && ciText.contains("decrease")),
      -effectSize
    ).otherwise(effectSize).cast(DoubleType)

  /** Orientation-harmonised odds ratio: reciprocal when flipped; a zero OR
    * cannot be flipped → null (associations.py:634-636).
    */
  def harmoniseOddsRatio(effectSize: Column, flippingNeeded: Column): Column =
    when((effectSize.cast(DoubleType) === 0) && flippingNeeded, lit(null))
      .when(flippingNeeded, lit(1.0) / effectSize)
      .otherwise(effectSize)
      .cast(DoubleType)

  /** GWAS-Catalog p-value-text → abbreviation map, loaded from the verbatim
    * reference asset (assets/data/gwas_pValueText_map.json; see
    * resources/schemas/PROVENANCE.md).
    */
  lazy val pValueTextMap: Map[String, String] = {
    val stream = getClass.getResourceAsStream("/gwas_pvaluetext_map.json")
    val text = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
    // flat string→string JSON object; parsed without external json deps
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(text)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2)))
      .toMap
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\").replace("\\/", "/")
      .replace("\\n", "\n").replace("\\t", "\t")

  /** Normalise the p-value-text column to standard abbreviations: strip
    * parentheses, split on comma, map each part; all-unmapped → null
    * (associations.py:103-146).
    */
  def normalisePvalueText(pValueText: Column): Column = {
    val mapCol = typedlit(pValueTextMap)
    val mapped = transform(
      split(regexp_replace(pValueText, "[\\(\\)]", ""), ","),
      x => element_at(mapCol, x))
    when(forall(mapped, x => x.isNull), lit(null)).otherwise(mapped)
  }

  /** Substudy description: `trait|text1_text2|EFO1/EFO2`
    * (associations.py:676-720).
    */
  def substudyDescription(
      associationTrait: Column,
      pValueText: Column,
      mappedTraitUri: Column
  ): Column = {
    val texts = coalesce(normalisePvalueText(pValueText), array(lit("no_pvalue_text")))
    concat_ws(
      "|",
      associationTrait,
      concat_ws("/", texts),
      concat_ws("/", graft.functions.GenomicOps.parseEfos(mappedTraitUri)))
  }

  /** GnomAD → Ensembl position: indels shift by +1 (associations.py:34-66). */
  def convertGnomadPositionToEnsembl(
      position: Column,
      reference: Column,
      alternate: Column
  ): Column =
    when(length(reference) > 1 || length(alternate) > 1, position + 1).otherwise(position)

  /** All rs ids attached to an association: reported SNP id, the numeric
    * current id (rs-prefixed when plausible), and the id part of the risk
    * allele (associations.py:176-200).
    */
  def collectRsids(snpId: Column, snpIdCurrent: Column, riskAllele: Column): Column = {
    val current = when(snpIdCurrent.rlike("^[0-9]*$"), format_string("rs%s", snpIdCurrent))
    array_distinct(array(snpId, current, split(riskAllele, "-").getItem(0)))
  }

  /** True when the GnomAD and GWAS-Catalog rs-id sets intersect
    * (associations.py:307-341).
    */
  def compareRsids(gnomad: Column, gwas: Column): Column =
    when(size(array_intersect(gnomad, gwas)) > 0, lit(true)).otherwise(lit(false))

  /** Keep a candidate mapping unless a better one exists for the same
    * association: rows flagged false are dropped only when some row of the
    * association is flagged true (associations.py:342-391).
    */
  def flagMappingsToRetain(associationId: Column, filterColumn: Column): Column = {
    val w = Window.partitionBy(associationId)
    // "any row flagged true" as a max over the boolean — constant window
    // state instead of a collect_set array copied into every row.
    val anyTrue = coalesce(max(filterColumn).over(w), lit(false))
    when(anyTrue && !filterColumn, lit(false)).otherwise(lit(true))
  }

  /** Maximum minor allele frequency across populations, biallelic
    * assumption (dataset/variant_index.py:207-226).
    */
  def maxMaf(alleleFrequencies: Column): Column =
    array_max(
      transform(
        alleleFrequencies,
        af =>
          when(af.getField("alleleFrequency") > 0.5, lit(1.0) - af.getField("alleleFrequency"))
            .otherwise(af.getField("alleleFrequency"))))

  /** Resolve raw associations to GnomAD variants
    * (associations.py:201-306): candidates match on
    * (chromosome, ensembl position); ambiguous matches are pruned by rs-id
    * agreement then allele concordance (dropping only when a better mapping
    * exists for the same row), and ties resolve to the highest max-MAF
    * variant. Unresolvable rows keep null variant columns for downstream QC
    * flagging.
    *
    * @param gwasAssociations raw rows incl. `rowId`, `CHR_ID`, `CHR_POS`,
    *                         `SNPS`, `SNP_ID_CURRENT`,
    *                         `STRONGEST SNP-RISK ALLELE`
    * @param variantIndex     (variantId, chromosome, position, rsIds,
    *                         referenceAllele, alternateAllele,
    *                         alleleFrequencies)
    */
  def mapVariantsToGnomadVariants(
      gwasAssociations: DataFrame,
      variantIndex: DataFrame
  ): DataFrame = {
    val subset = gwasAssociations.select(
      col("rowId"),
      col("CHR_ID").as("chromosome"),
      col("CHR_POS").cast(IntegerType).as("ensemblPosition"),
      collectRsids(
        split(col("SNPS"), "; ").getItem(0),
        col("SNP_ID_CURRENT"),
        split(col("STRONGEST SNP-RISK ALLELE"), "; ").getItem(0)
      ).as("rsIdsGwasCatalog"),
      extractRiskAllele(col("STRONGEST SNP-RISK ALLELE")).as("riskAllele")
    )
    val vaSubset = variantIndex
      .select(
        col("variantId"),
        col("chromosome"),
        convertGnomadPositionToEnsembl(
          col("position"), col("referenceAllele"), col("alternateAllele"))
          .as("ensemblPosition"),
        col("position"),
        col("rsIds").as("rsIdsGnomad"),
        col("referenceAllele"),
        col("alternateAllele"),
        maxMaf(col("alleleFrequencies")).as("maxMaf")
      )
      .join(
        subset.select("chromosome", "ensemblPosition").distinct(),
        Seq("chromosome", "ensemblPosition"),
        "inner")
    val filtered = subset
      .join(vaSubset, Seq("chromosome", "ensemblPosition"), "left")
      .withColumn(
        "rsIdFilter",
        flagMappingsToRetain(
          col("rowId"), compareRsids(col("rsIdsGnomad"), col("rsIdsGwasCatalog"))))
      .withColumn(
        "concordanceFilter",
        flagMappingsToRetain(
          col("rowId"),
          isConcordant(col("riskAllele"), col("referenceAllele"), col("alternateAllele"))))
      .filter(col("rsIdFilter") || col("concordanceFilter"))
    val resolved = graft.functions.DfOps
      .getTopRankedInWindow(
        filtered,
        Window.partitionBy(col("rowId")).orderBy(col("maxMaf").desc, col("variantId").asc))
      .select(
        col("rowId"), col("variantId"), col("referenceAllele"), col("alternateAllele"),
        col("chromosome"), col("position"))
    gwasAssociations.join(resolved, Seq("rowId"), "left")
  }

  /** Full effect harmonisation to beta
    * (associations.py:959-1093): extract the reported risk allele, flag
    * palindromic pairs, decide flipping from the allele orientation, split
    * the effect into beta/odds-ratio by CI text, and normalise to
    * (beta, standardError) with the SE recovered from the neglog p-value or
    * the OR confidence interval. Input columns: `STRONGEST SNP-RISK ALLELE`,
    * `referenceAllele`, `alternateAllele`, `OR or BETA`, `95% CI (TEXT)`,
    * `PVALUE_MLOG`.
    */
  def harmoniseEffectToBeta(df: DataFrame): DataFrame = {
    val (mantissa, exponent) = Stats.pvalueFromNeglogpval(col("PVALUE_MLOG"))
    // Batched withColumns: every withColumn call re-runs the FULL analyzer
    // over the accumulated plan, and with this file's large when/regex
    // expression trees the eager re-analysis dominated the query's driver
    // time (round-18 PlanTimeProbe: q_gwas_harmonise spent 4.0 s in
    // DataFrame construction vs 0.2 s of executor CPU). Three dependency
    // layers → three analysis rounds instead of six; expressions unchanged.
    val withFlags = df
      .withColumns(Map(
        "reportedRiskAllele" -> extractRiskAllele(col("STRONGEST SNP-RISK ALLELE")),
        "isAllelePalindromic" ->
          areAllelesPalindromic(col("referenceAllele"), col("alternateAllele")),
        "effectType" -> effectType(col("95% CI (TEXT)"))))
      .withColumn(
        "needsFlipping",
        effectNeedsHarmonisation(col("reportedRiskAllele"), col("referenceAllele")))
      .withColumns(Map(
        "effect_beta" ->
          when(
            (col("effectType") === "beta") && !col("isAllelePalindromic"),
            harmoniseBeta(col("OR or BETA"), col("95% CI (TEXT)"), col("needsFlipping"))),
        "effect_odds_ratio" ->
          when(
            (col("effectType") === "odds_ratio") && !col("isAllelePalindromic"),
            harmoniseOddsRatio(col("OR or BETA"), col("needsFlipping")))))
    val ciLower = regexp_extract(col("95% CI (TEXT)"), "\\[(\\d+\\.*\\d*)-\\d+\\.*\\d*\\]", 1)
      .cast(DoubleType)
    val ciUpper = regexp_extract(col("95% CI (TEXT)"), "\\[\\d+\\.*\\d*-(\\d+\\.*\\d*)\\]", 1)
      .cast(DoubleType)
    val (beta, se) = Stats.normaliseGwasStatistics(
      beta0 = col("effect_beta"),
      oddsRatio = col("effect_odds_ratio"),
      standardError = lit(null).cast(DoubleType),
      ciUpper = ciUpper,
      ciLower = ciLower,
      mantissa = mantissa,
      exponent = exponent
    )
    withFlags.select(df.columns.map(col) :+ beta :+ se: _*)
  }

  /** All GWAS-Catalog association QC flags in one pass
    * (associations.py:722-924): variant×variant interactions, subsignificant
    * p-values, missing genomic location, chromosome/position/allele count
    * inconsistencies, unmapped variants, palindromic alleles.
    */
  def qcAll(
      qc: Column,
      chromosome: Column,
      position: Column,
      referenceAllele: Column,
      alternateAllele: Column,
      strongestSnpRiskAllele: Column,
      pValueMantissa: Column,
      pValueExponent: Column,
      pValueCutoff: Double = 5e-8
  ): Column = {
    import graft.core.GDataset.updateQualityFlag
    val qc1 = updateQualityFlag(qc, strongestSnpRiskAllele.contains(";"), CompositeFlag)
    val qc2 = updateQualityFlag(
      qc1,
      Stats.neglogpvalFromPvalue(pValueMantissa, pValueExponent) <
        lit(-math.log10(pValueCutoff)),
      SubsignificantFlag)
    val qc3 = updateQualityFlag(qc2, position.isNull || chromosome.isNull, NoGenomicLocationFlag)
    // Null-safe part counts: `size(NULL)` is -1 with ANSI off (legacy
    // sizeOfNull) but NULL with ANSI on, so a bare size(split(...)) makes
    // this flag fire differently per config on rows with a null field —
    // the one sensitivity the round-13 ANSI-off oracle sweep found. The
    // when-guard pins the ANSI-on three-valued semantics (null term drops
    // out of the OR; the other comparison can still fire) under every
    // config.
    def nParts(c: Column): Column = when(c.isNotNull, size(split(c, ";")))
    val qc4 = updateQualityFlag(
      qc3,
      (nParts(chromosome) =!= nParts(position)) ||
        (nParts(chromosome) =!= nParts(strongestSnpRiskAllele)),
      InconsistencyFlag)
    val qc5 = updateQualityFlag(qc4, alternateAllele.isNull, NonMappedVariantFlag)
    updateQualityFlag(
      qc5,
      areAllelesPalindromic(referenceAllele, alternateAllele),
      PalindromicAlleleFlag)
  }

  /** Full curated-association ingestion
    * (associations.py:1094-1186 from_source): assign row ids, resolve
    * variants against gnomAD, apply the six-flag QC rollup, split the
    * p-value, harmonise the effect to beta, and emit study-locus rows with
    * md5 studyLocusIds and substudy descriptions. Raw columns required:
    * `CHR_ID`, `CHR_POS`, `SNPS`, `SNP_ID_CURRENT`,
    * `STRONGEST SNP-RISK ALLELE`, `P-VALUE`, `PVALUE_MLOG`, `OR or BETA`,
    * `95% CI (TEXT)`, `DISEASE/TRAIT`, `P-VALUE (TEXT)`,
    * `MAPPED_TRAIT_URI`, `STUDY ACCESSION`.
    */
  def fromSource(
      gwasAssociations: DataFrame,
      gnomadVariants: DataFrame,
      pvalueThreshold: Double = 5e-8
  ): DataFrame = {
    import graft.core.GDataset
    val withRow = gwasAssociations.withColumn(
      "rowId", monotonically_increasing_id().cast("string"))
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("P-VALUE"))
    mapVariantsToGnomadVariants(withRow, gnomadVariants)
      .withColumn(
        "qualityControls",
        qcAll(
          qc = array().cast("array<string>"),
          chromosome = col("CHR_ID"),
          position = col("CHR_POS").cast(IntegerType),
          referenceAllele = col("referenceAllele"),
          alternateAllele = col("alternateAllele"),
          strongestSnpRiskAllele = col("STRONGEST SNP-RISK ALLELE"),
          pValueMantissa = mantissa,
          pValueExponent = exponent,
          pValueCutoff = pvalueThreshold
        ))
      .withColumn("pValueMantissa", mantissa)
      .withColumn("pValueExponent", exponent)
      .transform(harmoniseEffectToBeta)
      .withColumnRenamed("STUDY ACCESSION", "studyId")
      .withColumn(
        "studyLocusId", GDataset.generateIdentifier(Seq("studyId", "variantId")))
      .select(
        col("studyLocusId"),
        col("variantId"),
        col("chromosome"),
        col("position"),
        col("studyId"),
        col("pValueMantissa"),
        col("pValueExponent"),
        substudyDescription(
          col("DISEASE/TRAIT"), col("P-VALUE (TEXT)"), col("MAPPED_TRAIT_URI"))
          .as("subStudyDescription"),
        col("qualityControls"),
        col("beta"),
        col("standardError")
      )
  }

  /** Re-key associations after substudy deconvolution: updated study ids
    * override, studyLocusId re-derives (associations.py:1194-1216).
    */
  def updateStudyId(studyLocus: DataFrame, studyAnnotation: DataFrame): DataFrame =
    studyLocus
      .join(studyAnnotation, Seq("studyId", "subStudyDescription"), "left")
      .withColumn("studyId", coalesce(col("updatedStudyId"), col("studyId")))
      .drop("subStudyDescription", "updatedStudyId")
      .withColumn(
        "studyLocusId",
        graft.core.GDataset.generateIdentifier(Seq("studyId", "variantId")))

  /** Flag variants that appear more than once within a study
    * (associations.py:1217-1234).
    */
  def qcAmbiguousStudy(studyLocus: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("studyId"), col("variantId"))
    studyLocus.withColumn(
      "qualityControls",
      graft.core.GDataset.updateQualityFlag(
        col("qualityControls"),
        count(col("variantId")).over(w) > 1,
        "Association with ambiguous study"))
  }

  /** Harmonise a raw association frame with GWAS-Catalog column names:
    * `CHR_ID`, `CHR_POS`, `STRONGEST SNP-RISK ALLELE`, `P-VALUE`,
    * `OR or BETA`, `95% CI (TEXT)`, `MAPPED_TRAIT_URI`, `STUDY ACCESSION`.
    */
  def harmoniseAssociations(raw: DataFrame): DataFrame = {
    val (mantissa, exponent) = Stats.splitPvalueColumn(col("P-VALUE"))
    // "rs123-A" → risk allele "A"
    val riskAllele = upper(trim(element_at(split(col("STRONGEST SNP-RISK ALLELE"), "-"), -1)))
    // CI text like "[0.88-0.94]" → bounds
    val ciLower = regexp_extract(col("95% CI (TEXT)"), "\\[([\\d.]+)-", 1).cast(DoubleType)
    val ciUpper = regexp_extract(col("95% CI (TEXT)"), "-([\\d.]+)\\]", 1).cast(DoubleType)
    val orOrBeta = col("OR or BETA").cast(DoubleType)
    // GWAS Catalog reports odds ratios ≥ 1 by convention; treat the value as
    // an OR when a CI is bracket-formatted, else as beta.
    val isOr = col("95% CI (TEXT)").rlike("^\\[")
    val (beta, se) = Stats.normaliseGwasStatistics(
      beta0 = when(!isOr, orOrBeta),
      oddsRatio = when(isOr, orOrBeta),
      standardError = lit(null).cast(DoubleType),
      ciUpper = when(isOr, ciUpper),
      ciLower = when(isOr, ciLower),
      mantissa = mantissa,
      exponent = exponent
    )
    raw.select(
      col("STUDY ACCESSION").as("studyId"),
      GenomicOps.normalizeChromosome(col("CHR_ID")),
      col("CHR_POS").cast(IntegerType).as("position"),
      riskAllele.as("riskAllele"),
      mantissa,
      exponent,
      beta,
      se,
      GenomicOps.parseEfos(col("MAPPED_TRAIT_URI")).as("efos")
    )
  }

  /** GCST accession from a harmonised summary-statistics file name
    * (summary_statistics.py:23-53 filename_to_study_identifier).
    */
  def filenameToStudyIdentifier(path: String): String = {
    val fileName = path.split("/").last
    "(GCST\\d+)".r.findFirstIn(fileName).getOrElse(
      throw new IllegalArgumentException(
        s"""Path ("$path") does not contain GWAS Catalog study identifier."""))
  }

  /** GWAS-Catalog harmonised summary-statistics preprocess: column-presence
    * dispatch between the old (`hm_`-prefixed) and new harmonisation
    * formats, p-value split (or reconstruction from -log10 p), OR/CI → beta
    * conversion through the shared harmonisation core, and the
    * position/beta sanity filters (summary_statistics.py:60-211
    * from_gwas_harmonized_summary_stats).
    *
    * The reference persists before filtering and round-robin repartitions to
    * 20; here the filters stay declarative (they push into the scan) and
    * the caller owns layout — a sort-free filter + range partition by
    * (chromosome, position) is the 100 TB layout, not a global orderBy.
    */
  def fromHarmonizedSumstats(raw: DataFrame, sumstatsFile: String): DataFrame = {
    val cols = raw.columns.toSet
    def pick(preferred: String, fallbacks: String*): Column =
      (preferred +: fallbacks).find(cols.contains).map(col)
        .getOrElse(lit(null))
    val chromosome = pick("hm_chrom", "chromosome").cast(StringType)
    val position = pick("hm_pos", "base_pair_location").cast(IntegerType)
    val refAllele = pick("hm_other_allele", "other_allele")
    val altAllele = pick("hm_effect_allele", "effect_allele")
    val (mantissa, exponent) =
      if (cols.contains("p_value")) Stats.splitPvalueColumn(col("p_value"))
      else Stats.pvalueFromNeglogpval(col("neg_log_10_p_value"))
    // Two-stage projection: parse the raw columns ONCE into attributes,
    // then derive beta/standardError from those attributes. Inlined into a
    // single select, the p-value parse and effect trees were duplicated
    // under the beta/se when-branches (subexpression elimination skips
    // conditionally-evaluated branches), and the fused projection method
    // grew past the JVM's 8000-byte JIT limit — "Generated method too long
    // to be JIT compiled: project_doConsume_0 is 10512 bytes", so the hot
    // loop ran as interpreted bytecode on EVERY row (round-18 finding;
    // q_gcat_sumstats 7.4 s wall / 5.8 s CPU → 2.9 s / 1.8 s). The parse
    // expressions are non-cheap and multi-referenced, so CollapseProject
    // keeps the stage split and codegen evaluates each once into a local.
    val parsed = raw.select(
      chromosome.as("chromosome"),
      position.as("position"),
      refAllele.as("_refAllele"),
      altAllele.as("_altAllele"),
      mantissa,
      exponent,
      pick("hm_beta", "beta").cast(DoubleType).as("_beta0"),
      pick("hm_odds_ratio", "odds_ratio", "hazard_ratio").cast(DoubleType).as("_oddsRatio"),
      pick("standard_error").cast(DoubleType).as("_standardError"),
      pick("ci_upper").cast(DoubleType).as("_ciUpper"),
      pick("ci_lower").cast(DoubleType).as("_ciLower"),
      pick("effect_allele_frequency").cast("float")
        .as("effectAlleleFrequencyFromSource"),
      pick("n").cast(IntegerType).as("sampleSize")
    )
    val (beta, se) = Stats.normaliseGwasStatistics(
      beta0 = col("_beta0"),
      oddsRatio = col("_oddsRatio"),
      standardError = col("_standardError"),
      ciUpper = col("_ciUpper"),
      ciLower = col("_ciLower"),
      mantissa = col("pValueMantissa"),
      exponent = col("pValueExponent")
    )
    parsed.select(
      lit(filenameToStudyIdentifier(sumstatsFile)).as("studyId"),
      concat_ws(
        "_", col("chromosome"), col("position"), col("_refAllele"), col("_altAllele"))
        .as("variantId"),
      col("chromosome"),
      col("position"),
      col("pValueMantissa"),
      col("pValueExponent"),
      beta,
      se,
      col("effectAlleleFrequencyFromSource"),
      col("sampleSize")
    )
      .filter(col("position").isNotNull)
      .filter(col("beta").isNotNull && col("beta") =!= 0)
  }
}

package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.SchemaRegistry
import graft.functions.GenomicOps

/** Ensembl VEP JSON-output reader: schema-declared nested JSON → flat variant
  * annotation (reference: datasource/ensembl/vep_parser.py:63-700; the full
  * parser builds the complete VariantIndex — this extracts the core identity
  * + consequence surface).
  */
object VepParser {

  /** Read raw VEP output with the declared schema (never inferred). */
  def readVepJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(SchemaRegistry("vep_json_output")).json(path)

  /** Flatten to one row per variant: identity from the VCF-style `input`
    * line, rs ids from colocated variants, most severe consequence, and the
    * per-gene consequence terms exploded from transcript consequences.
    */
  def extractVariants(vep: DataFrame): DataFrame = {
    val inputParts = split(col("input"), "\t")
    vep
      .select(
        concat_ws(
          "_",
          regexp_replace(inputParts.getItem(0), "^chr", ""),
          inputParts.getItem(1),
          inputParts.getItem(3),
          inputParts.getItem(4)
        ).as("variantId"),
        regexp_replace(col("seq_region_name"), "^chr", "").as("chromosome"),
        col("start").cast("int").as("position"),
        inputParts.getItem(3).as("referenceAllele"),
        inputParts.getItem(4).as("alternateAllele"),
        col("most_severe_consequence").as("mostSevereConsequence"),
        transform(col("colocated_variants"), v => v.getField("id")).as("rsIds"),
        col("transcript_consequences")
      )
  }

  private val SoMap = typedlit(VariantConsequences.soMap)
  private val ScoreMap = typedlit(VariantConsequences.scoreMap)

  /** Consequence term → SO identifier (vep_parser.py SEQUENCE_ONTOLOGY_MAP). */
  def soId(term: Column): Column = element_at(SoMap, term)

  /** Consequence term → severity score (vep_parser.py LABEL_TO_SCORE_MAP). */
  def consequenceScore(term: Column): Column = element_at(ScoreMap, term)

  /** Transcript with the highest value of `scoreField`: null-scored
    * transcripts dropped, ties keep array order
    * (vep_parser.py:291-337 _get_most_severe_transcript).
    */
  def mostSevereTranscript(transcripts: Column, scoreField: String): Column = {
    val sorted = array_sort(
      filter(transcripts, t => t.getField(scoreField).isNotNull),
      (a, b) =>
        when(a.getField(scoreField) > b.getField(scoreField), lit(-1))
          .when(a.getField(scoreField) < b.getField(scoreField), lit(1))
          .otherwise(lit(0))
    )
    get(sorted, lit(0))
  }

  /** One in-silico predictor as a variantEffect struct, taken from the most
    * severely scored transcript (vep_parser.py:410-486).
    */
  def variantEffectExtractor(
      transcripts: Column,
      methodName: String,
      scoreField: Option[String] = None,
      assessmentField: Option[String] = None,
      flagField: Option[String] = None
  ): Column = {
    val t = scoreField match {
      case Some(sf) => mostSevereTranscript(transcripts, sf)
      case None =>
        get(filter(transcripts, tr => tr.getField(assessmentField.get).isNotNull), lit(0))
    }
    val assessment = assessmentField
      .map(f => t.getField(f).cast(StringType))
      .getOrElse(lit(null).cast(StringType))
    // try_cast: LOFTEE passes its "HC"/"LC" assessment as the score column,
    // which must null out (ANSI-safe equivalent of the reference's cast)
    val score = scoreField
      .map(f => t.getField(f).try_cast(FloatType))
      .getOrElse(lit(null).cast(FloatType))
    val flag = flagField
      .map(f => t.getField(f).cast(StringType))
      .getOrElse(lit(null).cast(StringType))
    when(
      t.isNotNull,
      struct(
        lit(methodName).as("method"),
        assessment.as("assessment"),
        score.as("score"),
        flag.as("assessmentFlag"),
        t.getField("gene_id").as("targetId"),
        lit(null).cast(DoubleType).as("normalisedScore")
      )
    )
  }

  /** Most severe AlphaMissense prediction across transcripts
    * (vep_parser.py:350-407).
    */
  def maxAlphaMissense(transcripts: Column): Column = {
    val t = get(filter(transcripts, tr => tr.getField("alphamissense").isNotNull), lit(0))
    when(
      t.isNotNull,
      struct(
        lit("AlphaMissense").as("method"),
        t.getField("alphamissense").getField("am_class").as("assessment"),
        t.getField("alphamissense").getField("am_pathogenicity").cast(FloatType).as("score"),
        lit(null).cast(StringType).as("assessmentFlag"),
        t.getField("gene_id").as("targetId"),
        lit(null).cast(DoubleType).as("normalisedScore")
      )
    )
  }

  /** VEP's own prediction from the most severe consequence term
    * (vep_parser.py:341-348).
    */
  def vepPrediction(mostSevereConsequence: Column): Column =
    struct(
      lit("VEP").as("method"),
      mostSevereConsequence.as("assessment"),
      consequenceScore(mostSevereConsequence).cast(FloatType).as("score"),
      lit(null).cast(StringType).as("assessmentFlag"),
      lit(null).cast(StringType).as("targetId"),
      lit(null).cast(DoubleType).as("normalisedScore")
    )

  /** All in-silico predictors for a variant: CADD, PolyPhen, SIFT, LOFTEE,
    * GERP, AlphaMissense and the VEP consequence prediction; absent
    * predictors are dropped (vep_parser.py:634-689).
    */
  def variantEffects(transcripts: Column, mostSevereConsequence: Column): Column =
    VariantEffectNormaliser.normaliseVariantEffect(
      when(
        transcripts.isNotNull,
        filter(
          array(
            variantEffectExtractor(transcripts, "CADD", Some("cadd_phred")),
            variantEffectExtractor(
              transcripts, "PolyPhen", Some("polyphen_score"), Some("polyphen_prediction")),
            variantEffectExtractor(
              transcripts, "SIFT", Some("sift_score"), Some("sift_prediction")),
            variantEffectExtractor(
              transcripts, "LOFTEE", Some("lof"), Some("lof"), Some("lof_filter")),
            variantEffectExtractor(transcripts, "GERP", Some("conservation")),
            maxAlphaMissense(transcripts),
            vepPrediction(mostSevereConsequence)
          ),
          p => p.isNotNull
        )
      ).otherwise(array(vepPrediction(mostSevereConsequence))))

  /** "A/B" + protein position → one-letter substitution code "A1B"
    * (vep_parser.py:488-525).
    */
  def aminoAcidChange(aminoAcids: Column, proteinEnd: Column): Column =
    when(
      aminoAcids.isNotNull && proteinEnd.isNotNull,
      concat(
        split(aminoAcids, "/").getItem(0),
        proteinEnd.cast(StringType),
        split(aminoAcids, "/").getItem(1)
      )
    ).otherwise(lit(null).cast(StringType))

  /** Distinct UniProt accessions from swissprot + trembl arrays, version
    * suffixes stripped (vep_parser.py:527-568).
    */
  def collectUniprotAccessions(swissprot: Column, trembl: Column): Column = {
    val merged = array_distinct(
      flatten(
        filter(array(coalesce(swissprot, array()), coalesce(trembl, array())), a => a.isNotNull)))
    val cleaned = transform(merged, acc => regexp_replace(acc, "\\.\\d+$", ""))
    when(size(cleaned) > 0, cleaned).otherwise(lit(null))
  }

  /** Full transcript-consequence structs in the variant_index shape: SO ids,
    * consequence score, footprint/TSS distances, canonical flag — sorted by
    * (consequenceScore desc, distanceFromFootprint asc) with a 1-based
    * transcriptIndex (vep_parser.py:706-800).
    */
  def transcriptConsequences(transcripts: Column): Column = {
    val mapped = transform(
      transcripts,
      t =>
        struct(
          transform(t.getField("consequence_terms"), y => soId(y))
            .as("variantFunctionalConsequenceIds"),
          aminoAcidChange(t.getField("amino_acids"), t.getField("protein_end"))
            .as("aminoAcidChange"),
          collectUniprotAccessions(t.getField("swissprot"), t.getField("trembl"))
            .as("uniprotAccessions"),
          when(t.getField("canonical") === 1, lit(true)).otherwise(lit(false))
            .as("isEnsemblCanonical"),
          t.getField("codons").as("codons"),
          coalesce(t.getField("distance"), lit(0)).cast(LongType).as("distanceFromFootprint"),
          t.getField("tssdistance").cast(LongType).as("distanceFromTss"),
          t.getField("appris").as("appris"),
          t.getField("mane_select").as("maneSelect"),
          t.getField("gene_id").as("targetId"),
          t.getField("impact").as("impact"),
          t.getField("lof").cast(StringType).as("lofteePrediction"),
          // the reference feeds `lof` into both fields (vep_parser.py:766-770),
          // where the non-ANSI string→float cast yields null — under ANSI
          // Spark the equivalent is a literal null
          lit(null).cast(FloatType).as("siftPrediction"),
          lit(null).cast(FloatType).as("polyphenPrediction"),
          array_max(transform(t.getField("consequence_terms"), y => consequenceScore(y)))
            .cast(FloatType)
            .as("consequenceScore"),
          t.getField("transcript_id").as("transcriptId"),
          t.getField("biotype").as("biotype"),
          t.getField("gene_symbol").as("approvedSymbol")
        )
    )
    val kept = filter(
      mapped,
      x => x.getField("consequenceScore").isNotNull && x.getField("distanceFromFootprint").isNotNull)
    val sorted = array_sort(
      kept,
      (a, b) => {
        val sa = a.getField("consequenceScore")
        val sb = b.getField("consequenceScore")
        val da = a.getField("distanceFromFootprint")
        val db = b.getField("distanceFromFootprint")
        when(sa > sb, lit(-1))
          .when(sa < sb, lit(1))
          .when(da < db, lit(-1))
          .when(da > db, lit(1))
          .otherwise(lit(0))
      }
    )
    when(
      transcripts.isNotNull,
      zip_with(
        sorted,
        sequence(lit(1), greatest(size(sorted), lit(1))),
        (x, i) => x.withField("transcriptIndex", i.cast(IntegerType))
      )
    )
  }

  /** Variant identifiers → dbXrefs structs for one source; null ids dropped,
    * null input → empty array (vep_parser.py:123-165).
    */
  def generateDbxrefs(ids: Column, source: String): Column = {
    val xrefs = transform(
      filter(ids, id => id.isNotNull),
      id => struct(id.cast(StringType).as("id"), lit(source).as("source")))
    when(xrefs.isNull, array().cast("array<struct<id:string,source:string>>"))
      .otherwise(xrefs)
  }

  /** rs ids of all colocated variants (vep_parser.py:166-199). */
  def colocatedVariantsToRsids(colocatedVariants: Column): Column =
    when(colocatedVariants.isNotNull, transform(colocatedVariants, v => v.getField("id")))

  /** Ensembl-variation xrefs from colocated rs ids (vep_parser.py:105-122). */
  def extractEnsemblXrefs(colocatedVariants: Column): Column =
    generateDbxrefs(colocatedVariantsToRsids(colocatedVariants), "ensembl_variation")

  /** OMIM xrefs: numeric ids reformatted `1234.5` → `1234#5`
    * (vep_parser.py:200-243).
    */
  def extractOmimXrefs(colocatedVariants: Column): Column = {
    val withOmim = filter(
      colocatedVariants,
      v => v.getField("var_synonyms").getField("OMIM").isNotNull)
    val ids = transform(
      withOmim,
      v =>
        transform(
          v.getField("var_synonyms").getField("OMIM"),
          id => regexp_replace(id.cast(StringType), "\\.", "#")))
    generateDbxrefs(flatten(ids), "omim")
  }

  /** ClinVar xrefs: VCV accessions only (vep_parser.py:244-289). */
  def extractClinvarXrefs(colocatedVariants: Column): Column = {
    val withClinvar = filter(
      colocatedVariants,
      v => v.getField("var_synonyms").getField("ClinVar").isNotNull)
    val ids = transform(
      withClinvar,
      v => filter(v.getField("var_synonyms").getField("ClinVar"), x => x.startsWith("VCV")))
    generateDbxrefs(flatten(ids), "clinvar")
  }

  /** Per-population allele frequencies in the variant_index shape from a
    * (populationName → frequency column) map. The reference sources these
    * from the GnomAD joint frequencies rather than VEP itself
    * (datasource/gnomad/variants.py; vep_parser.py:778-780 attaches an empty
    * array) — this builder serves the GnomAD-side assembly.
    */
  def alleleFrequencies(populations: Seq[(String, Column)]): Column =
    array(populations.map { case (name, freq) =>
      struct(lit(name).as("populationName"), freq.cast(DoubleType).as("alleleFrequency"))
    }: _*)

  /** "missense_variant" → "Missense variant", non-"variant" terms get the
    * suffix appended (vep_parser.py:930-944).
    */
  def processConsequenceTerm(term: Column): Column = {
    val last = when(term.contains("variant"), lit("")).otherwise(lit(" variant"))
    concat(regexp_replace(initcap(term), "_", " "), last)
  }

  private def geneLabel(transcript: Column): Column =
    when(transcript.getField("approvedSymbol").isNotNull, transcript.getField("approvedSymbol"))
      .otherwise(transcript.getField("targetId"))

  private def processOverlap(transcript: Column): Column =
    when(
      transcript.getField("distanceFromFootprint") === 0,
      concat(lit(" overlapping with "), geneLabel(transcript))
    ).otherwise(
      concat(
        lit(" "),
        format_number(transcript.getField("distanceFromFootprint"), 0),
        lit(" basepair away from "),
        geneLabel(transcript)))

  private def processAaChange(transcript: Column): Column =
    when(
      transcript.getField("aminoAcidChange").isNotNull,
      concat(
        lit(", causing amino-acid change: "),
        transcript.getField("aminoAcidChange"),
        lit(" with "),
        lower(transcript.getField("impact")),
        lit(" impact."))
    ).otherwise(lit("."))

  private def processLof(transcript: Column): Column =
    when(
      transcript.getField("lofteePrediction").isNotNull &&
        (transcript.getField("lofteePrediction") === "HC"),
      lit(" A high-confidence loss-of-function variant by loftee.")
    ).otherwise(lit(""))

  private def addingBiotype(transcript: Column): Column = {
    val biotype = when(
      transcript.getField("biotype").contains("gene"),
      regexp_replace(transcript.getField("biotype"), "_", " ")
    ).otherwise(
      concat(regexp_replace(transcript.getField("biotype"), "_", " "), lit(" gene.")))
    concat(lit(", a "), biotype)
  }

  private def parseProteinCodingTranscript(transcript: Column): Column =
    when(
      transcript.isNotNull,
      concat(
        lit(" The closest protein-coding gene is "),
        geneLabel(transcript),
        lit(" ("),
        format_number(transcript.getField("distanceFromFootprint"), 0),
        lit(" basepair away)."))
    ).otherwise(lit(""))

  /** Human-readable variant description from the most severe consequence and
    * the top-ranked (protein-coding) transcript (vep_parser.py:892-1118).
    */
  def composeVariantDescription(
      mostSevereConsequence: Column,
      firstTranscript: Column,
      firstProteinCoding: Column
  ): Column =
    when(firstTranscript.isNull, lit("Intergenic variant no gene in window"))
      .when(
        firstTranscript.getField("biotype") === "protein_coding",
        concat(
          processConsequenceTerm(mostSevereConsequence),
          processOverlap(firstTranscript),
          processAaChange(firstTranscript),
          processLof(firstTranscript)))
      .otherwise(
        concat(
          processConsequenceTerm(mostSevereConsequence),
          processOverlap(firstTranscript),
          addingBiotype(firstTranscript),
          parseProteinCodingTranscript(firstProteinCoding)))

  /** VEP output → schema-valid variant_index frame
    * (vep_parser.py:597-890 process_vep_output): canonical-only transcripts,
    * in-silico predictor extraction, SO-mapped consequences with index,
    * rs ids, HGVS id, hashed long variant ids.
    */
  def buildVariantIndex(vep: DataFrame, hashThreshold: Int = 100): DataFrame = {
    val inputParts = split(col("input"), "\t")
    val canonical = filter(col("transcript_consequences"), c => c.getField("canonical") === 1)
    vep
      .withColumn("transcript_consequences", canonical)
      .select(
        concat_ws(
          "_",
          regexp_replace(inputParts.getItem(0), "^chr", ""),
          inputParts.getItem(1),
          inputParts.getItem(3),
          inputParts.getItem(4)
        ).as("variantId"),
        regexp_replace(col("seq_region_name"), "^chr", "").as("chromosome"),
        col("start").cast(IntegerType).as("position"),
        inputParts.getItem(3).as("referenceAllele"),
        inputParts.getItem(4).as("alternateAllele"),
        variantEffects(col("transcript_consequences"), col("most_severe_consequence"))
          .as("variantEffect"),
        soId(col("most_severe_consequence")).as("mostSevereConsequenceId"),
        transcriptConsequences(col("transcript_consequences")).as("transcriptConsequences"),
        transform(col("colocated_variants"), v => v.getField("id")).as("rsIds"),
        when(
          size(col("transcript_consequences")) > 0,
          col("transcript_consequences").getItem(0).getField("hgvsg")
        ).when(
          size(col("intergenic_consequences")) > 0,
          col("intergenic_consequences").getItem(0).getField("hgvsg")
        ).otherwise(lit(null)).as("hgvsId"),
        array().cast(
          "array<struct<populationName:string,alleleFrequency:double>>"
        ).as("alleleFrequencies"),
        extractEnsemblXrefs(col("colocated_variants")).as("ensembl_xrefs"),
        extractOmimXrefs(col("colocated_variants")).as("omim_xrefs"),
        extractClinvarXrefs(col("colocated_variants")).as("clinvar_xrefs"),
        col("most_severe_consequence").as("most_severe_consequence_kept")
      )
      .withColumn(
        "variantId",
        GenomicOps.hashLongVariantIds(
          col("variantId"), col("chromosome"), col("position"), hashThreshold)
      )
      // protvar xref for missense variants (vep_parser.py:806-826)
      .withColumn(
        "protvar_xrefs",
        when(
          size(
            filter(
              col("transcriptConsequences"),
              x => array_contains(x.getField("variantFunctionalConsequenceIds"), "SO_0001583")
            )) > 0,
          generateDbxrefs(array(col("variantId")), "protvar")
        ))
      .withColumn(
        "dbXrefs",
        flatten(
          filter(
            array(
              col("ensembl_xrefs"), col("omim_xrefs"),
              col("clinvar_xrefs"), col("protvar_xrefs")),
            x => x.isNotNull)))
      .drop("ensembl_xrefs", "omim_xrefs", "clinvar_xrefs", "protvar_xrefs")
      .withColumn(
        "variantDescription", {
          val firstTranscript = get(
            filter(col("transcriptConsequences"), t => t.getField("transcriptIndex") === 1),
            lit(0))
          val proteinCoding = array_sort(
            filter(col("transcriptConsequences"), t => t.getField("biotype") === "protein_coding"),
            (a, b) =>
              when(a.getField("transcriptIndex") < b.getField("transcriptIndex"), lit(-1))
                .when(a.getField("transcriptIndex") > b.getField("transcriptIndex"), lit(1))
                .otherwise(lit(0)))
          composeVariantDescription(
            col("most_severe_consequence_kept"), firstTranscript, get(proteinCoding, lit(0)))
        })
      .drop("most_severe_consequence_kept")
      .filter(col("position").isNotNull)
  }

  /** LOFTEE variant→gene assignments (dataset/variant_index.py:343-366):
    * only LOFTEE-annotated transcripts survive; HC → high-quality pLoF true,
    * LC → false. Shuffle-free explode + filter projection.
    */
  def getLoftee(variantIndex: DataFrame): DataFrame =
    variantIndex
      .select(col("variantId"), explode(col("transcriptConsequences")).as("tc"))
      .filter(col("tc.lofteePrediction").isNotNull)
      .withColumn(
        "isHighQualityPlof",
        when(col("tc.lofteePrediction") === "HC", lit(true))
          .when(col("tc.lofteePrediction") === "LC", lit(false)))
      .select(
        col("variantId"),
        col("tc.targetId").as("targetId"),
        col("tc.lofteePrediction").as("lofteePrediction"),
        col("isHighQualityPlof"))

  /** One row per (variant, gene): consequence terms per affected gene. */
  def geneConsequences(variants: DataFrame): DataFrame =
    variants
      .select(
        col("variantId"),
        explode(col("transcript_consequences")).as("tc")
      )
      .select(
        col("variantId"),
        col("tc.gene_id").as("geneId"),
        col("tc.consequence_terms").as("consequenceTerms"),
        col("tc.impact").as("impact")
      )
}

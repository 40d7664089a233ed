package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StringType}

/** Genomic-domain column helpers (reference: common/processing.py:21-245,
  * common/genomic_region.py:14-110).
  */
object GenomicOps {

  /** Parse EFO identifiers from a comma-separated list of URIs: distinct last
    * path components (common/processing.py:21-51).
    */
  def parseEfos(efoUris: Column): Column =
    array_distinct(transform(split(efoUris, ","), uri => element_at(split(uri, "/"), -1)))

  /** Chromosome part of a `chromosome_position_ref_alt` variant ID
    * (common/processing.py:54-82).
    */
  def extractChromosome(variantId: Column): Column =
    regexp_extract(variantId, "^(.*)_\\d+_.*$", 1)

  /** Position part of a `chromosome_position_ref_alt` variant ID
    * (common/processing.py:85-107).
    */
  def extractPosition(variantId: Column): Column =
    regexp_extract(variantId, "^.*_(\\d+)_.*$", 1)

  /** Normalise chromosome notation: strip `chr`, M→MT, 23→X, 24→Y
    * (common/processing.py:110-149).
    */
  def normalizeChromosome(chromosome: Column): Column = {
    val ensemblChr = regexp_replace(chromosome.cast(StringType), "^chr", "")
    when(ensemblChr === "M", "MT")
      .when(ensemblChr === "23", "X")
      .when(ensemblChr === "24", "Y")
      .otherwise(ensemblChr)
      .alias("chromosome")
  }

  /** Minor allele frequency with DecimalType rounding control
    * (common/processing.py:152-196).
    */
  def maf(af: Column, scale: Int = 10): Column = {
    val precision = scale + 1
    val scaledAf = af.cast(DecimalType(precision, scale))
    val maxAf = lit(1.0).cast(DecimalType(precision, scale))
    when(af.isNotNull && (af <= 0.5), scaledAf)
      .when(af.isNotNull, maxAf - scaledAf)
      .otherwise(lit(null))
      .alias("minorAlleleFrequency")
  }

  /** Minor allele count = 2·maf·n (common/processing.py:199-245). */
  def mac(maf: Column, n: Column): Column =
    when(maf.isNotNull && n.isNotNull, (maf * n * 2).cast(IntegerType))
      .otherwise(lit(null))
      .alias("minorAlleleCount")

  /** Reverse complement of an allele string (gwas_catalog/associations.py:459-496). */
  def reverseComplement(allele: Column): Column =
    when(
      allele.rlike("^[ACTG]+$"),
      reverse(translate(allele, "ACTG", "TGAC"))
    ).otherwise(allele)

  /** The MHC region constant (common/genomic_region.py:20-24). */
  final case class Region(chromosome: String, start: Int, end: Int)

  val MHC: Region = parseRegion("chr6:25726063-33400556")

  def parseRegion(s: String): Region = {
    val Array(chr, range) = s.split(":")
    val Array(start, end) = range.split("-")
    Region(chr.stripPrefix("chr"), start.toInt, end.toInt)
  }

  /** Predicate: row inside the region (exclude with negation)
    * (dataset/summary_statistics.py:121-145).
    */
  def inRegion(chromosome: Column, position: Column, region: Region): Column =
    (chromosome === lit(region.chromosome)) &&
      (position >= lit(region.start)) && (position <= lit(region.end))

  /** Hash long variant identifiers into stable `OTVAR_` ids, leaving short
    * ones unchanged; missing coordinates hash the id alone
    * (dataset/variant_index.py:72-126). Must stay bit-exact with the
    * reference (md5 of the same string).
    */
  def hashLongVariantIds(
      variantId: Column,
      chromosome: Column,
      position: Column,
      threshold: Int
  ): Column =
    when(
      chromosome.isNull || position.isNull,
      concat(lit("OTVAR_"), md5(variantId))
    ).when(
      length(variantId) >= threshold,
      concat_ws("_", lit("OTVAR"), chromosome, position, md5(variantId))
    ).otherwise(variantId)

  /** snake/space/symbol-separated name → camelCase (common/spark.py:218-236). */
  def string2CamelCase(name: String): String = {
    val normalised = name.replaceAll("[/()\\-]+", " ")
    val parts = normalised.split("[ _-]").filter(_.nonEmpty)
    (parts.headOption.map(_.toLowerCase) ++ parts.drop(1).map(p => p.toLowerCase.capitalize)).mkString
  }

  /** Rename every column of a frame to camelCase (common/spark.py:239-253). */
  def renameColumnsToCamelCase(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, string2CamelCase(c)))

  /** Variant-type classifier used by the sumstats harmoniser: complementary
    * SNP / other SNP / indel (common/processing.py:330-352).
    */
  def variantType(allele0: Column, allele1: Column): Column =
    when(
      (length(allele0) === 1) && (length(allele1) === 1),
      when(
        ((allele0 === "A") && (allele1 === "T")) ||
          ((allele0 === "T") && (allele1 === "A")) ||
          ((allele0 === "G") && (allele1 === "C")) ||
          ((allele0 === "C") && (allele1 === "G")),
        "snp_c"
      ).otherwise("snp_n")
    ).otherwise("indel")
}

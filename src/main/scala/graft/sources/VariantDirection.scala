package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType}
import org.apache.spark.sql.{Column, DataFrame}

/** Variant direction lookup table — every strand/allele orientation of a
  * variant enumerated so raw sumstats harmonisation becomes ONE equi join
  * (reference: dataset/variant_direction.py:116-440).
  *
  * Scale notes: the LUT rows are bucketed by `rangeId = ⌊position / 10 Mb⌋`
  * so a bucketed-table sink co-locates the join with the sumstats side;
  * the allele expansion is a pure array literal per row — 4 rows for
  * strand-resolvable variants, 2 for ambiguous ones, no shuffle.
  */
object VariantDirection {

  val DefaultWindowSize = 10000000

  /** String reverse (variant_direction.py:162-188). */
  def reverseAllele(allele: Column): Column = reverse(allele)

  /** ACGT complement via translate (variant_direction.py:189-218). */
  def complement(allele: Column): Column = translate(upper(allele), "ACGT", "TGCA")

  /** Palindromic (strand-ambiguous) alleles: same length and
    * revcomp(alt) == ref (variant_direction.py:125-161).
    */
  def isStrandAmbiguous(ref: Column, alt: Column): Column =
    when(
      length(ref) === length(alt) &&
        reverseAllele(complement(upper(alt))) === upper(ref),
      true).otherwise(false)

  /** Variant type code: 1 SNP, 2 INS, 3 DEL, 4 MNP
    * (variant_direction.py:219-264).
    */
  def variantType(ref: Column, alt: Column): Column =
    when(length(upper(alt)) > length(upper(ref)), lit(2))
      .when(length(upper(alt)) < length(upper(ref)), lit(3))
      .when(length(upper(alt)) === 1 && length(upper(ref)) === 1, lit(1))
      .otherwise(lit(4))
      .cast(ByteType)

  /** `chrom_pos_ref_alt` identifier (variant_direction.py:373-389). */
  def variantId(chrom: Column, pos: Column, ref: Column, alt: Column): Column =
    concat_ws("_", chrom, pos, upper(ref), upper(alt))

  /** The orientation expansion (variant_direction.py:265-372): forward
    * direct/flipped plus, for strand-resolvable variants, the
    * reverse-strand pair. direction/strand are ±1 byte codes.
    */
  def alleles(chrom: Column, pos: Column, ref0: Column, alt0: Column, af: Column): Column = {
    val ref = upper(ref0)
    val alt = upper(alt0)
    def entry(vid: Column, direction: Int, strand: Int, ambiguous: Boolean) =
      struct(
        vid.as("variantId"),
        lit(direction).cast(ByteType).as("direction"),
        lit(strand).cast(ByteType).as("strand"),
        lit(ambiguous).as("isStrandAmbiguous"),
        af.as("originalAlleleFrequencies"))
    val fwdDirect = variantId(chrom, pos, ref, alt)
    val fwdFlipped = variantId(chrom, pos, alt, ref)
    val revDirect = variantId(
      chrom, pos, reverseAllele(complement(ref)), reverseAllele(complement(alt)))
    val revFlipped = variantId(
      chrom, pos, reverseAllele(complement(alt)), reverseAllele(complement(ref)))
    when(
      !isStrandAmbiguous(ref, alt),
      array(
        entry(fwdDirect, 1, 1, ambiguous = false),
        entry(fwdFlipped, -1, 1, ambiguous = false),
        entry(revDirect, 1, -1, ambiguous = false),
        entry(revFlipped, -1, -1, ambiguous = false)))
      .otherwise(
        array(
          entry(fwdDirect, 1, 1, ambiguous = true),
          entry(fwdFlipped, -1, 1, ambiguous = true)))
  }

  /** Build the direction LUT from a variant index
    * (variant_direction.py:390-440).
    */
  def fromVariantIndex(
      variantIndex: DataFrame,
      windowSize: Int = DefaultWindowSize
  ): DataFrame =
    variantIndex
      .select(
        col("chromosome"),
        floor(col("position") / windowSize).cast(IntegerType).as("rangeId"),
        col("variantId").as("originalVariantId"),
        variantType(col("referenceAllele"), col("alternateAllele")).as("type"),
        explode(
          alleles(
            col("chromosome"), col("position"),
            col("referenceAllele"), col("alternateAllele"),
            col("alleleFrequencies"))).as("allele"))
      .select(
        col("chromosome"), col("rangeId"), col("originalVariantId"), col("type"),
        col("allele.variantId").as("variantId"),
        col("allele.direction").as("direction"),
        col("allele.strand").as("strand"),
        col("allele.isStrandAmbiguous").as("isStrandAmbiguous"),
        col("allele.originalAlleleFrequencies").as("originalAlleleFrequencies"))
}

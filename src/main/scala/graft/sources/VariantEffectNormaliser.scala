package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Normalise in-silico variant-effect scores onto a common [-1, 1] scale
  * (reference: dataset/variant_index.py:360-718, VariantEffectNormaliser).
  * Pure column arithmetic — every method is a `when` chain over linear
  * rescales, fully codegen, no UDFs.
  *
  * Negative values mean benign, positive deleterious; magnitude is
  * confidence.
  */
object VariantEffectNormaliser {

  /** Linear rescale [minValue, maxValue] → [minimum, maximum]
    * (variant_index.py:443-465).
    */
  def rescale(
      column: Column,
      minValue: Double,
      maxValue: Double,
      minimum: Double = 0.0,
      maximum: Double = 1.0
  ): Column =
    (column - minValue) / (maxValue - minValue) * (maximum - minimum) + minimum

  /** FoldX ΔΔG: |ddG| ≥ 2 kcal/mol saturates at 1 (variant_index.py:466-486). */
  def normaliseFoldx(score: Column): Column =
    when(abs(score) >= 2, lit(1.0)).otherwise(rescale(abs(score), 0.0, 2.0))

  /** CADD: benign ↦ [-1,0], then three deleterious bands
    * (variant_index.py:488-511).
    */
  def normaliseCadd(score: Column): Column =
    when(score <= 10, rescale(score, 0, 10, -1.0, 0.0))
      .when(score <= 20, rescale(score, 10, 20, 0.0, 0.5))
      .when(score <= 30, rescale(score, 20, 30, 0.5, 0.75))
      .when(score > 30, rescale(score, 30, 81, 0.75, 1))

  /** GERP conservation bands (variant_index.py:513-545). */
  def normaliseGerp(score: Column): Column =
    when(score > 6, lit(1.0))
      .when(score >= 2, rescale(score, 2, 6, 0.75, 1))
      .when(score >= 0, rescale(score, 0, 2, 0.25, 0.75))
      .when(score >= -3, rescale(score, -3, 0, 0.0, 0.25))
      .when(score < -3, lit(0.0))

  /** Loss-of-function curation verdicts → ordinal scores
    * (variant_index.py:547-572).
    */
  def normaliseLof(assessment: Column): Column =
    when(assessment === "lof", lit(1.0))
      .when(assessment === "likely_lof", lit(0.5))
      .when(assessment === "uncertain", lit(0.0))
      .when(assessment === "likely_not_lof", lit(-0.5))
      .when(assessment === "not_lof", lit(-1.0))

  /** LOFTEE: HC → 1, LC → 0.85 (variant_index.py:574-594). */
  def normaliseLoftee(assessment: Column): Column =
    when(assessment === "HC", lit(1.0)).when(assessment === "LC", lit(0.85))

  /** SIFT: deleterious bands on 1−score with assessment gating
    * (variant_index.py:596-639).
    */
  def normaliseSift(score: Column, assessment: Column): Column = {
    val inv = lit(1) - round(score.cast(DoubleType), 2)
    when(inv >= 0.95 && assessment === "deleterious", rescale(lit(1) - score, 0.95, 1, 0.5, 1))
      .when(
        inv >= 0.95 && assessment === "deleterious_low_confidence",
        rescale(lit(1) - score, 0.95, 1, 0, 0.5))
      .when(
        inv <= 0.95 && assessment === "tolerated_low_confidence",
        rescale(lit(1) - score, 0, 0.95, -0.5, 0.0))
      .when(inv <= 0.95 && assessment === "tolerated", rescale(lit(1) - score, 0, 0.95, -1, -0.5))
  }

  /** PolyPhen bands; unknown assessment → null (variant_index.py:641-672). */
  def normalisePolyphen(assessment: Column, score: Column): Column =
    when(assessment === "unknown", lit(null).cast(DoubleType))
      .when(score <= 0.446, rescale(score, 0, 0.446, -1.0, -0.25))
      .when(score <= 0.908, rescale(score, 0.446, 0.908, -0.25, 0.25))
      .when(score > 0.908, rescale(score, 0.908, 1.0, 0.25, 1.0))

  /** AlphaMissense bands (variant_index.py:674-697). */
  def normaliseAlphaMissense(score: Column): Column =
    when(score < 0.06, rescale(score, 0, 0.06, -1.0, -0.25))
      .when(score < 0.77, rescale(score, 0.06, 0.77, -0.25, 0.25))
      .when(score >= 0.77, rescale(score, 0.77, 1, 0.25, 1))

  /** Pangolin splice scores on |score| (variant_index.py:699-718). */
  def normalisePangolin(score: Column): Column =
    when(abs(score) > 0.14, rescale(abs(score), 0.14, 1, 0.5, 1))
      .when(abs(score) <= 0.14, rescale(abs(score), 0, 0.14, 0.0, 0.5))

  /** Dispatch on the predictor method (variant_index.py:410-440). SpliceAI
    * and VEP scores pass through unscaled.
    */
  def resolvePredictorMethods(score: Column, method: Column, assessment: Column): Column =
    when(method === "LOFTEE", normaliseLoftee(assessment))
      .when(method === "SIFT", normaliseSift(score, assessment))
      .when(method === "PolyPhen", normalisePolyphen(assessment, score))
      .when(method === "AlphaMissense", normaliseAlphaMissense(score))
      .when(method === "CADD", normaliseCadd(score))
      .when(method === "Pangolin", normalisePangolin(score))
      .when(method === "LossOfFunctionCuration", normaliseLof(assessment))
      .when(method === "SpliceAI", score)
      .when(method === "VEP", score)
      .when(method === "GERP", normaliseGerp(score))
      .when(method === "FoldX", normaliseFoldx(score))

  /** Append `normalisedScore` to each variantEffect struct
    * (variant_index.py:381-408). Array HOF — no explode.
    */
  def normaliseVariantEffect(variantEffect: Column): Column =
    transform(
      variantEffect,
      p =>
        struct(
          p.getField("method").as("method"),
          p.getField("assessment").as("assessment"),
          p.getField("score").as("score"),
          p.getField("assessmentFlag").as("assessmentFlag"),
          p.getField("targetId").as("targetId"),
          resolvePredictorMethods(
            p.getField("score"), p.getField("method"), p.getField("assessment"))
            .cast(DoubleType)
            .as("normalisedScore")))
}

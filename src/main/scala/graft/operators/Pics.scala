package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps
import graft.functions.expressions.norm_survival_function

/** PICS fine-mapping: posterior probability that each LD tag is causal,
  * from the lead's significance and tag r² (reference: method/pics.py:36-208).
  *
  * Unlike the reference's Python UDF, this is a pure column HOF chain (the
  * normal survival function is a native codegen expression) — per-locus work
  * happens inside the projection with no Python-worker or UDF boundary.
  */
object Pics {

  /** PICS µ: expected neglog-p of a tag (pics.py:89-111); valid for r² ≥ 0.5. */
  def mu(neglogP: Column, r2: Column): Column = neglogP * r2

  /** PICS σ from the permutation-fit curve (pics.py:59-86). */
  def standardDeviation(neglogP: Column, r2: Column, k: Double): Column =
    abs(sqrt(lit(1.0) - pow(sqrt(r2), k)) * sqrt(neglogP) / 2)

  /** Annotate an ldSet with PICS posteriors: tags with r² < 0.5 (or null) are
    * silently dropped, relative posteriors are the two-sided normal tail at
    * the lead's neglog-p, then normalised to sum to 1 (pics.py:114-208).
    *
    * @param idField name of the tag-id field in the input structs
    *                (`tagVariantId` in raw LD sets, `variantId` downstream)
    */
  def finemap(
      ldSet: Column,
      leadNeglogP: Column,
      k: Double = 6.4,
      idField: String = "tagVariantId"
  ): Column = {
    val valid = filter(
      ldSet,
      t =>
        t.getField("r2Overall").isNotNull && t.getField("r2Overall") >= 0.5 &&
          leadNeglogP.isNotNull && leadNeglogP =!= 0.0
    )
    val withRel = transform(
      valid,
      t => {
        val r2 = t.getField("r2Overall")
        val m = mu(leadNeglogP, r2)
        val sd0 = standardDeviation(leadNeglogP, r2, k)
        val sd = when(sd0 === 0.0, 0.001).otherwise(sd0)
        val rel = norm_survival_function((leadNeglogP - m) / sd) * 2
        struct(
          t.getField(idField).as("variantId"),
          r2.as("r2Overall"),
          pow(lit(10.0), -sd).as("standardError"),
          rel.as("relativePosteriorProbability")
        )
      }
    )
    normalise(withRel)
  }

  /** Scale relative posteriors to sum to 1 over an already-materialised
    * array of (variantId, r2Overall, standardError,
    * relativePosteriorProbability) structs.
    */
  def normalise(withRel: Column): Column = {
    val total = aggregate(
      withRel, lit(0.0), (acc, t) => acc + t.getField("relativePosteriorProbability"))
    // Let-bind (array, total): mentioning `total` directly inside the
    // transform would re-run the aggregate — and, for an unstaged
    // withRel chain, the survival-function kernel — once PER ELEMENT.
    ArrayOps.bindOnce("arr" -> withRel, "tot" -> total) { get =>
      transform(
        get("arr"),
        t =>
          struct(
            t.getField("variantId").as("variantId"),
            t.getField("r2Overall").as("r2Overall"),
            t.getField("standardError").as("standardError"),
            when(
              get("tot") =!= 0.0,
              t.getField("relativePosteriorProbability") / get("tot"))
              .as("posteriorProbability")
          )
      )
    }
  }

  /** Two-stage variant for DataFrame pipelines: materialises the
    * relative-posterior array as a column first, so the normal-sf kernel runs
    * once per tag instead of once per downstream reference (interpreted HOF
    * lambdas re-evaluate inlined children).
    */
  def finemapStaged(
      df: org.apache.spark.sql.DataFrame,
      ldSetCol: String,
      neglogCol: String,
      outCol: String,
      k: Double = 6.4,
      idField: String = "tagVariantId"
  ): org.apache.spark.sql.DataFrame = {
    val valid = filter(
      col(ldSetCol),
      t =>
        t.getField("r2Overall").isNotNull && t.getField("r2Overall") >= 0.5 &&
          col(neglogCol).isNotNull && col(neglogCol) =!= 0.0
    )
    val withRel = transform(
      valid,
      t => {
        val r2 = t.getField("r2Overall")
        val m = mu(col(neglogCol), r2)
        val sd0 = standardDeviation(col(neglogCol), r2, k)
        val sd = when(sd0 === 0.0, 0.001).otherwise(sd0)
        val rel = norm_survival_function((col(neglogCol) - m) / sd) * 2
        struct(
          t.getField(idField).as("variantId"),
          r2.as("r2Overall"),
          pow(lit(10.0), -sd).as("standardError"),
          rel.as("relativePosteriorProbability")
        )
      }
    )
    df.withColumn("_pics_rel", withRel)
      .withColumn(outCol, normalise(col("_pics_rel")))
      .drop("_pics_rel")
  }
}

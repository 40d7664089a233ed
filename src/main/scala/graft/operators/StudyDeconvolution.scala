package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Study deconvolution: the same studyId can arrive from several sources with
  * partly-filled metadata; merge duplicates with full-partition window
  * aggregates (reference: dataset/study_index.py:683-839).
  *
  * One shuffle on studyId; every merge rule is a frame-spanning window
  * aggregate so the row count is preserved until the final dedup.
  */
object StudyDeconvolution {

  /** Merge duplicated study rows: array columns are unioned
    * (flatten + collect_set + array_distinct), scalar columns take the first
    * non-null value; one row per studyId survives.
    *
    * @param arrayCols  array-typed metadata to union across duplicates
    * @param scalarCols scalar metadata to coalesce across duplicates
    */
  def deconvolute(
      studies: DataFrame,
      arrayCols: Seq[String],
      scalarCols: Seq[String]
  ): DataFrame = {
    val full = Window
      .partitionBy("studyId")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val merged = arrayCols.foldLeft(studies) { (df, c) =>
      df.withColumn(
        c,
        array_sort(array_distinct(flatten(collect_set(col(c)).over(full))))
      )
    }
    val coalesced = scalarCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(full.orderBy(col(c).asc_nulls_last)))
    }
    coalesced
      .withColumn(
        "_rn",
        row_number().over(Window.partitionBy("studyId").orderBy(scalarCols.headOption
          .map(col).getOrElse(col("studyId"))))
      )
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}

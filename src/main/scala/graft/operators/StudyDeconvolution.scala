package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Study deconvolution: the same studyId can arrive from several sources with
  * partly-filled metadata; merge duplicates into one row per studyId
  * (reference: dataset/study_index.py:683-839).
  *
  * One partial-aggregable groupBy on studyId does every merge rule at once:
  * array columns union (flatten + distinct + sort), scalar columns take
  * their minimum (= first non-null ascending), and any remaining columns
  * ride along from the row with the smallest non-null head scalar. The
  * former formulation was k+2 WindowExecs over the same partitioning — one
  * full-frame SORT per scalar column (each had its own orderBy) plus a
  * whole-partition array materialised into EVERY duplicate row before the
  * final row_number dedup; the aggregate form is one exchange, no sorts,
  * and map-side combining shrinks duplicate groups before the shuffle.
  */
object StudyDeconvolution {

  /** Merge duplicated study rows: array columns are unioned
    * (flatten + collect_list + array_distinct), scalar columns take the
    * first non-null value ascending (= min); one row per studyId survives.
    *
    * @param arrayCols  array-typed metadata to union across duplicates
    * @param scalarCols scalar metadata to coalesce across duplicates
    */
  def deconvolute(
      studies: DataFrame,
      arrayCols: Seq[String],
      scalarCols: Seq[String]
  ): DataFrame = {
    val merge = (arrayCols ++ scalarCols).toSet + "studyId"
    val others = studies.columns.filterNot(merge.contains)
    // Deterministic carrier pick for unmerged columns: the row with the
    // smallest non-null head scalar (nulls last via the isNull prefix —
    // struct ordering is lexicographic). Falls back to studyId (constant in
    // the group → arbitrary-but-single row) when no scalars are given.
    val pickKey: Column = scalarCols.headOption
      .map(c => struct(col(c).isNull, col(c)))
      .getOrElse(col("studyId"))
    val aggs =
      arrayCols.map(c => array_sort(array_distinct(flatten(collect_list(col(c))))).as(c)) ++
        scalarCols.map(c => min(col(c)).as(c)) ++
        (if (others.isEmpty) Nil
         else Seq(min_by(struct(others.map(col): _*), pickKey).as("_carried")))
    // Degenerate call (no array/scalar cols on a studyId-only frame) has
    // nothing to merge: fall back to a plain dedup instead of agg() with an
    // empty list.
    if (aggs.isEmpty) return studies.dropDuplicates("studyId")
    val grouped = studies.groupBy(col("studyId")).agg(aggs.head, aggs.tail: _*)
    grouped.select(
      studies.columns.map { c =>
        if (others.contains(c)) col(s"_carried.$c").as(c) else col(c)
      }.toSeq: _*)
  }
}

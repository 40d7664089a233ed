package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Golden-record survivorship: collapse duplicate records of one entity
  * (the output of identity resolution / [[Dedup.connectedComponents]])
  * into a single best row — per attribute, the value from the most recent
  * record that actually HAS the attribute. The standard merge step of a
  * master-data / contact-record pipeline.
  *
  * One hash aggregation, map-side combinable: each attribute is a
  * `max_by(attr, recency-if-present)` — no per-attribute windows, no
  * self-joins, no collect of the duplicate group.
  */
object Survivorship {

  /** @param recencyCol total-order recency (ties broken by the ordering of
    *                    max_by's underlying comparison — give it a unique
    *                    column like an ingest sequence for determinism)
    * @param attrCols   attributes to survive independently
    * @return one row per key: survived attributes + `n_merged` +
    *         `last_seen` (max recency over the group)
    */
  def goldenRecord(
      records: DataFrame,
      keyCols: Seq[String],
      recencyCol: String,
      attrCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val survived = attrCols.map { a =>
      max_by(col(a), when(col(a).isNotNull, col(recencyCol))).as(a)
    }
    records
      .groupBy(keyCols.map(col): _*)
      .agg(
        survived.head,
        survived.tail ++ Seq(
          count(lit(1)).as("n_merged"),
          max(col(recencyCol)).as("last_seen")): _*)
  }
}

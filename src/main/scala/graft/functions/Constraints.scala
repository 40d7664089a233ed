package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Declarative data-quality constraint checking — the ingest gate a
  * production pipeline runs before promoting a batch (the generic form of
  * the reference's per-dataset QC flag rollups).
  *
  * All row-level rules (null rate, range, set membership, custom
  * predicate) evaluate in ONE aggregation pass over the frame — a
  * `sum(when(violated, 1))` per rule inside a single codegen
  * HashAggregate — never one count job per rule (the reference's
  * missingness loop fires one job per feature;
  * l2g_feature_matrix.py:113-136). Uniqueness adds one count-distinct to
  * the same pass; foreign-key rules each add one left-anti count against
  * their reference frame (broadcast when small, bloom-prunable when not).
  *
  * The report is one row per rule: `(rule, column, violations, total,
  * pass)` — collect it, gate on `pass`, or persist it next to the batch.
  */
object Constraints {

  sealed trait Rule
  /** At most `maxNullRate` of rows may be null. */
  final case class NotNull(col: String, maxNullRate: Double = 0.0) extends Rule
  /** `cols` tuples must be globally unique. */
  final case class Unique(cols: Seq[String]) extends Rule
  /** Values (when non-null) must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule
  /** Values (when non-null) must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule
  /** Arbitrary row predicate that must hold. */
  final case class Satisfies(name: String, predicate: Column) extends Rule
  /** Every non-null value must exist in `ref(refCol)`. */
  final case class ForeignKey(col: String, ref: DataFrame, refCol: String) extends Rule

  /** (kind, column, violation predicate, allowed violation rate). */
  private def violation(r: Rule): Option[(String, String, Column, Double)] = r match {
    case NotNull(c, maxRate) =>
      Some(("not_null", c, col(c).isNull, maxRate))
    case InRange(c, lo, hi) =>
      Some(("in_range", c, col(c).isNotNull && !(col(c) >= lo && col(c) <= hi), 0.0))
    case InSet(c, vs) =>
      Some(("in_set", c, col(c).isNotNull && !col(c).isin(vs: _*), 0.0))
    case Satisfies(n, p) =>
      Some(("satisfies", n, !coalesce(p, lit(false)), 0.0))
    case _ => None
  }

  /** Evaluate all rules; returns `(rule, column, violations, total, pass)`
    * rows. Row-level rules share one aggregation job; each Unique adds a
    * count-distinct to it; each ForeignKey adds one anti-join count.
    */
  def check(spark: SparkSession, df: DataFrame, rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    val rowRules = rules.flatMap(violation)
    val uniques = rules.collect { case u: Unique => u }
    val fks = rules.collect { case f: ForeignKey => f }

    val aggs = count(lit(1)).as("_total") +:
      (rowRules.zipWithIndex.map { case ((_, _, v, _), i) =>
        sum(when(v, 1L).otherwise(0L)).as(s"_v_$i")
      } ++ uniques.zipWithIndex.map { case (u, i) =>
        countDistinct(struct(u.cols.map(col): _*)).as(s"_d_$i")
      })
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("_total")

    val rowResults = rowRules.zipWithIndex.map { case ((kind, c, _, allowed), i) =>
      val v = row.getAs[Long](s"_v_$i")
      val pass = if (total == 0) true else v.toDouble / total <= allowed
      (kind, c, v, total, pass)
    }
    val uniqueResults = uniques.zipWithIndex.map { case (u, i) =>
      val dups = total - row.getAs[Long](s"_d_$i")
      ("unique", u.cols.mkString(","), dups, total, dups == 0L)
    }
    val fkResults = fks.map { case ForeignKey(c, ref, refCol) =>
      val missing = df
        .filter(col(c).isNotNull)
        .join(ref.select(col(refCol).as(c)).distinct(), Seq(c), "left_anti")
        .count()
      ("foreign_key", c, missing, total, missing == 0L)
    }
    (rowResults ++ uniqueResults ++ fkResults)
      .toDF("rule", "column", "violations", "total", "pass")
  }
}

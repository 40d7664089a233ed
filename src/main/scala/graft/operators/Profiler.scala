package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import org.apache.spark.sql.{Column, DataFrame}

/** ANALYZE-style table profiling: per-column row/null/distinct counts and
  * min/max/mean in ONE aggregation pass — the statistics a pipeline records
  * next to every published dataset (and feeds to CBO-style planning and
  * data-quality drift alerts).
  *
  * The exact profile uses `count(DISTINCT c)` per column, which Catalyst
  * executes with one Expand over the scan (rows × k columns) — correct and
  * oracle-checkable, priced for profiling runs. The approximate profile
  * swaps in `approx_count_distinct` (HLL++): no Expand, fully map-side
  * combinable, the variant to run on 100 TB — its sketches are also what
  * [[graft.functions.SketchOps]] persists for incremental rollups.
  */
object Profiler {

  /** One row per profiled column:
    * `(column, n_rows, n_nulls, n_distinct, min_num, max_num, avg_num,
    * min_str, max_str)` — the `_num` metrics are null for non-numeric
    * columns and vice versa, so mixed-type tables profile into one frame.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  /** The 100 TB variant: HLL++ distinct estimates, zero Expand. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Statistics drift between two profiles of the same table (release n vs
    * n+1) — the alert input of a data-quality gate: per column the
    * null-fraction movement, NDV ratio, mean shift, and whether the value
    * range widened (new values outside the old envelope — the classic
    * symptom of an upstream schema/unit change). Profile frames are tiny
    * (one row per column), so this is a driver-cheap broadcast join no
    * matter how large the profiled table was.
    */
  def drift(oldProfile: DataFrame, newProfile: DataFrame): DataFrame = {
    def pfx(df: DataFrame, p: String): DataFrame =
      df.columns.filter(_ != "column").foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    val j = pfx(oldProfile, "o_").join(pfx(newProfile, "n_"), Seq("column"), "full_outer")
    j.select(
      col("column"),
      col("o_n_rows").as("n_rows_old"),
      col("n_n_rows").as("n_rows_new"),
      round(col("o_n_nulls").cast("double") / col("o_n_rows"), 6).as("null_frac_old"),
      round(col("n_n_nulls").cast("double") / col("n_n_rows"), 6).as("null_frac_new"),
      round(col("n_n_distinct").cast("double") / col("o_n_distinct"), 6).as("ndv_ratio"),
      round(col("n_avg_num") - col("o_avg_num"), 6).as("avg_shift"),
      coalesce(
        col("n_min_num") < col("o_min_num") || col("n_max_num") > col("o_max_num") ||
          col("n_min_str") < col("o_min_str") || col("n_max_str") > col("o_max_str"),
        lit(false)).as("range_widened")
    )
  }

  private def profileWith(
      df: DataFrame,
      cols: Seq[String],
      distinctAgg: String => Column
  ): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    // Two aggregation passes, NOT one: string min/max buffers are not
    // hash-aggregable (DeclarativeAggregate over StringType → SortAggregate),
    // and the count(DISTINCT) Expand rewrite adds a gid grouping — combined
    // in one agg that means Sort + SortAggregate over rows × k expanded
    // rows. Split, the counts pass keeps fixed-width buffers (HashAggregate
    // through the Expand) and the range pass is a GLOBAL aggregate, which
    // SortAggregate executes without any Sort. Both 1-row results meet in a
    // broadcast-trivial cross join; two scans beat one n·k-row sort at any
    // scale.
    val countsRow = df.agg(
      count(lit(1)).as("_rows"),
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(count(col(c)).as(s"_nn_$i"), distinctAgg(c).as(s"_nd_$i"))
      }: _*)
    val rangesRow = df.agg(
      min(col(cols.head)).as("_raw_mn_0"),
      cols.zipWithIndex.flatMap { case (c, i) =>
        val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
        (if (i == 0) Seq.empty[Column] else Seq(min(col(c)).as(s"_raw_mn_$i"))) ++
          Seq(max(col(c)).as(s"_raw_mx_$i")) ++
          (if (numeric) Seq(avg(col(c)).as(s"_avg_$i")) else Nil)
      }: _*)
    val perCol = cols.zipWithIndex.map { case (c, i) =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      struct(
        lit(c).as("column"),
        col("_rows").as("n_rows"),
        (col("_rows") - col(s"_nn_$i")).as("n_nulls"),
        col(s"_nd_$i").as("n_distinct"),
        (if (numeric) round(col(s"_raw_mn_$i").cast("double"), 6) else nullD).as("min_num"),
        (if (numeric) round(col(s"_raw_mx_$i").cast("double"), 6) else nullD).as("max_num"),
        (if (numeric) round(col(s"_avg_$i"), 6) else nullD).as("avg_num"),
        (if (numeric) nullS else col(s"_raw_mn_$i").cast("string")).as("min_str"),
        (if (numeric) nullS else col(s"_raw_mx_$i").cast("string")).as("max_str")
      )
    }
    countsRow
      .crossJoin(rangesRow)
      .select(explode(array(perCol: _*)).as("_p"))
      .select(col("_p.*"))
  }
}

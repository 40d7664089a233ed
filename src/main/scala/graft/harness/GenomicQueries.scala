package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.datasets.SummaryStatistics
import graft.operators.{Sessionize, WindowBasedClumping}

/** Oracle-checked queries for the genomic pipeline operators: window-based
  * clumping (SURVEY §2.5 / §7.2 end-to-end slice) and its LLM-pipeline twin,
  * gap-based sessionization.
  */
object GenomicQueries {
  import Tables._

  /** Clumping distance used by the oracle pair below. */
  private val Distance = 100000L

  /** Deterministic synthetic GWAS summary statistics derived from lineitem:
    * positions are an injective affine hash of (orderkey, linenumber) so rank
    * tie-breaking is deterministic; p-values derive from position. Exercises
    * SummaryStatistics construction + schema validation end-to-end.
    */
  def synthSumstats(s: SparkSession, d: String): SummaryStatistics = {
    // lineitem's (orderkey, linenumber) is NOT unique in the synthetic data,
    // so every column derives from (studyId, chromosome, position) and the
    // projection is made distinct — guaranteeing positions are unique within
    // (studyId, chromosome), which keeps window tie-breaking deterministic.
    val x = col("l_orderkey") * 8 + col("l_linenumber")
    val position = (x * lit(2654435761L)) % lit(1000000007L)
    val df = lineitem(s, d).select(
      concat(lit("s"), (col("l_suppkey") % 10).cast(StringType)).as("studyId"),
      concat(
        (lit(1) + col("l_partkey") % 4).cast(StringType), lit("_"),
        position.cast(StringType), lit("_A_T")
      ).as("variantId"),
      (lit(1) + col("l_partkey") % 4).cast(StringType).as("chromosome"),
      position.cast(IntegerType).as("position"),
      ((position % 1000) / lit(1000.0) - lit(0.5)).as("beta"),
      (lit(1000) + position % 50).cast(IntegerType).as("sampleSize"),
      (lit(1.0) + (position % 700) / lit(100.0)).cast(FloatType).as("pValueMantissa"),
      (-(lit(4) + position % 13)).cast(IntegerType).as("pValueExponent"),
      (lit(0.01) + (position % 100) / lit(1000.0)).as("standardError")
    )
      // Repartition on the family's dominant downstream key BEFORE the
      // dedup: HashPartitioning(studyId, chromosome) satisfies the
      // all-column distinct's clustering (subset-key satisfaction, on by
      // default), so the distinct plans NO exchange of its own and every
      // (studyId, chromosome) window consumer (clumping, locus breaker)
      // reuses the same layout — one exchange for the whole chain instead
      // of distinct-by-all-columns plus a window re-shuffle (guide §2.4).
      // Aggregation consumers keyed by studyId alone still re-shuffle
      // exactly as before (a superset partitioning cannot serve them), so
      // this is neutral for the QC family. Measured at sf0.1 (MemProbe):
      // q_clump shuffle 82 → 47 MB, q_locus_breaker 44 → 25 MB.
      .repartition(col("studyId"), col("chromosome"))
      .distinct()
    SummaryStatistics(df).validate()
  }

  /** Lag-gap peak clustering: cluster-id assignment only
    * (method/window_based_clumping.py:28-112).
    */
  def clumpCluster(s: SparkSession, d: String): DataFrame = {
    val ss = synthSumstats(s, d).df
    ss.select(
      col("studyId"), col("chromosome"), col("position"),
      WindowBasedClumping
        .clusterPeaks(col("studyId"), col("chromosome"), col("position"), Distance)
        .as("cluster_id")
    )
  }

  /** Full window-based clumping through the typed
    * SummaryStatistics → StudyLocus path (schema-validated on both ends);
    * greedy lead pruning runs once per cluster
    * (method/window_based_clumping.py:155-258).
    */
  def clump(s: SparkSession, d: String): DataFrame = {
    val clumped = synthSumstats(s, d).windowBasedClumping(Distance).validate()
    clumped.df.select(
      col("studyId"), col("chromosome"), col("position"), col("variantId"),
      col("studyLocusId"),
      concat_ws(";", col("qualityControls")).as("qc_str")
    )
  }

  /** Gap-based sessionization over the events stream (gap = 1800 s). */
  def sessionize(s: SparkSession, d: String): DataFrame =
    Sessionize.sessionStats(events(s, d), gapSeconds = 1800)

  /** Per-user linear gap-fill (operators/TimeSeries.interpolateLinear):
    * every 5th event's value is nulled, interpolation must reconstruct it
    * from the time-nearest observed neighbours; t is microseconds (unique
    * per user in this data — the operator's documented contract).
    */
  def interpolate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val ev = events(s, d)
    val micros = ev.schema("ts").dataType match {
      case LongType          => expr("ts div 1000")
      case TimestampType     => unix_micros(col("ts"))
      case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
    }
    val base = ev.select(
      col("user_id"), col("event_id"), micros.as("t"),
      when(col("event_id") % 5 === 0, lit(null).cast("double"))
        .otherwise(col("value")).as("v"))
    graft.operators.TimeSeries
      .interpolateLinear(base, Seq("user_id"), "t", "v")
      .select(
        col("user_id"), col("event_id"), col("t"),
        round(col("v_filled"), 6).as("v_filled"))
  }

  // -- oracles ---------------------------------------------------------------

  private val SynthSql =
    """SELECT DISTINCT 's' || CAST(l_suppkey % 10 AS VARCHAR) AS studyId,
      |  CAST(1 + l_partkey % 4 AS VARCHAR) AS chromosome,
      |  CAST(((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007 AS INTEGER) AS position,
      |  CAST(1.0 + (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 700 / 100.0 AS REAL) AS pValueMantissa,
      |  CAST(-(4 + (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 13) AS INTEGER) AS pValueExponent
      |FROM lineitem""".stripMargin

  private val ClusterSql =
    s"""WITH ss AS ($SynthSql),
       |b AS (
       |  SELECT *, CASE WHEN lag(position) OVER w IS NULL OR position - lag(position) OVER w > $Distance
       |      THEN studyId || '_' || chromosome || '_' || CAST(position AS VARCHAR) END AS boundary
       |  FROM ss WINDOW w AS (PARTITION BY studyId, chromosome ORDER BY position)),
       |c AS (
       |  SELECT *, last_value(boundary IGNORE NULLS) OVER (PARTITION BY studyId, chromosome ORDER BY position
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_id FROM b)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clump_cluster" -> (clumpCluster _),
    "q_clump" -> (clump _),
    "q_sessionize" -> (sessionize _),
    "q_interpolate" -> (interpolate _),
    "q_rolling_stats" -> (rollingStats _)
  )

  /** Rolling 1-hour trailing stats per user (operators/FeatureOps
    * .rollingStats) over the event stream; t in microseconds.
    */
  def rollingStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val ev = events(s, d)
    val micros = ev.schema("ts").dataType match {
      case LongType          => expr("ts div 1000")
      case TimestampType     => unix_micros(col("ts"))
      case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
    }
    graft.operators.FeatureOps
      .rollingStats(
        ev.select(col("user_id"), col("event_id"), micros.as("t"), col("value")),
        Seq("user_id"), "t", "value", windowSize = 3600L * 1000000L)
      .select(
        col("user_id"), col("event_id"), col("roll_n"),
        round(col("roll_sum"), 6).as("roll_sum"),
        round(col("roll_mean"), 6).as("roll_mean"),
        round(col("roll_min"), 6).as("roll_min"),
        round(col("roll_max"), 6).as("roll_max"))
  }

  val oracles: Map[String, String] = Map(
    "q_rolling_stats" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events)
        |SELECT user_id, event_id,
        |  CAST(count(value) OVER w AS BIGINT) AS roll_n,
        |  round(sum(value) OVER w, 6) AS roll_sum,
        |  round(avg(value) OVER w, 6) AS roll_mean,
        |  round(min(value) OVER w, 6) AS roll_min,
        |  round(max(value) OVER w, 6) AS roll_max
        |FROM b
        |WINDOW w AS (PARTITION BY user_id ORDER BY t
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_interpolate" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v FROM events),
        |w AS (SELECT *,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
        |  last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt
        |  FROM b)
        |SELECT user_id, event_id, t,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
        |      THEN pv + (nv - pv) * CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)
        |    WHEN pv IS NOT NULL THEN pv
        |    ELSE nv END, 6) AS v_filled
        |FROM w""".stripMargin,
    "q_clump_cluster" ->
      s"""$ClusterSql
         |SELECT studyId, chromosome, position, cluster_id FROM c""".stripMargin,
    "q_clump" ->
      s"""${ClusterSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY studyId, chromosome, cluster_id
         |    ORDER BY pValueExponent ASC, pValueMantissa ASC, position ASC) AS rn FROM c),
         |sel AS (
         |  SELECT cluster_id, rn, [position] AS leads FROM ranked WHERE rn = 1
         |  UNION ALL
         |  SELECT r.cluster_id, r.rn,
         |    CASE WHEN len(list_filter(s.leads, lp -> abs(lp - r.position) < $Distance)) = 0
         |      THEN list_append(s.leads, r.position) ELSE s.leads END
         |  FROM sel s JOIN ranked r ON r.cluster_id = s.cluster_id AND r.rn = s.rn + 1),
         |final AS (
         |  SELECT cluster_id, leads FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY rn DESC) AS k FROM sel) WHERE k = 1)
         |SELECT r.studyId, r.chromosome, r.position,
         |  r.chromosome || '_' || CAST(r.position AS VARCHAR) || '_A_T' AS variantId,
         |  md5(r.studyId || r.chromosome || '_' || CAST(r.position AS VARCHAR) || '_A_T') AS studyLocusId,
         |  CASE WHEN list_contains(f.leads, r.position) THEN ''
         |       ELSE '${WindowBasedClumping.WindowClumpedFlag}' END AS qc_str
         |FROM ranked r JOIN final f ON r.cluster_id = f.cluster_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_sec, value, props, event_type FROM events),
        |g AS (SELECT *, CASE WHEN ts_sec - lag(ts_sec) OVER w IS NULL OR ts_sec - lag(ts_sec) OVER w > 1800
        |        THEN 1 ELSE 0 END AS is_new FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec)),
        |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |  round(sum(value), 6) AS value_sum,
        |  max(ts_sec) - min(ts_sec) AS duration_sec,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
        |FROM s GROUP BY user_id, session_idx""".stripMargin
  )
}

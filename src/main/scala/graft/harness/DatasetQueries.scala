package graft.harness

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.datasets.{StudyLocus, SummaryStatistics}
import graft.operators.Annotations

/** Oracle-checked queries for dataset-level operators that previously had
  * only ScalaTest evidence: sanity_filter, credible-set / LD-set array
  * filters, the boundaries range join, and global-sort ordering.
  */
object DatasetQueries {
  import Tables._

  /** Sumstats with planted defects: zero betas, null SEs, p ≥ 1, null
    * mantissas, infinite betas — sanityFilter must drop exactly those
    * (reference: dataset/summary_statistics.py:147-176).
    */
  def sanityFilterQ(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val raw = orders(s, d).select(
      k.as("row_id"),
      when(k % 11 === 0, lit(0.0))
        .when(k % 31 === 0, lit(Double.PositiveInfinity))
        .otherwise(((k % 19) - 9) / lit(10.0)).as("beta"),
      when(k % 13 === 0, lit(null).cast("double"))
        .when(k % 17 === 0, lit(0.0))
        .otherwise(lit(0.01) + (k % 50) / lit(1000.0)).as("standardError"),
      when(k % 7 === 0, lit(null).cast("float"))
        .otherwise((lit(1.0) + (k % 90) / lit(10.0)).cast("float")).as("pValueMantissa"),
      when(k % 5 === 0, lit(0)).otherwise(-(k % 30 + 1)).cast(IntegerType)
        .as("pValueExponent")
    )
    SummaryStatistics(raw).sanityFilter().df
      .select(
        col("row_id"),
        round(col("beta"), 6).as("beta"),
        round(col("standardError"), 6).as("standardError"),
        round(col("pValueMantissa").cast("double"), 4).as("pValueMantissa"),
        col("pValueExponent"))
  }

  /** Credible-interval + LD-set array filters
    * (dataset/study_locus.py:803-843): per locus, 4 tags with deterministic
    * 95%-membership and 4 LD tags with deterministic r²; output the kept
    * members in array order.
    */
  def credsetFilterQ(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    def tag(j: Int) = struct(
      concat(lit("v"), lit(j)).as("variantId"),
      ((k + j) % 3 =!= 0).as("is95CredibleSet")
    )
    def ld(j: Int) = struct(
      concat(lit("t"), lit(j)).as("tagVariantId"),
      (((k * (j + 1)) % 100) / lit(100.0)).as("r2Overall")
    )
    val locusDf = orders(s, d).select(
      k.as("row_id"),
      array(tag(0), tag(1), tag(2), tag(3)).as("locus"),
      array(ld(0), ld(1), ld(2), ld(3)).as("ldSet")
    )
    StudyLocus(locusDf)
      .filterCredibleSet()
      .filterLdSet(0.5)
      .df
      .select(
        col("row_id"),
        concat_ws(",", transform(col("locus"), x => x.getField("variantId"))).as("kept_tags"),
        concat_ws(",", transform(col("ldSet"), x => x.getField("tagVariantId"))).as("kept_ld"),
        size(col("locus")).as("n_tags"),
        size(col("ldSet")).as("n_ld")
      )
  }

  /** Boundaries range join: collect sumstats between each lead's
    * locusStart/locusEnd (dataset/study_locus.py:1342-1405).
    */
  def boundariesQ(s: SparkSession, d: String): DataFrame = {
    val ss = GenomicQueries.synthSumstats(s, d).df
    val leads = ss
      .filter(col("position") % 89 === 0)
      .select(
        col("studyId"), col("chromosome"),
        concat_ws("_", col("studyId"), col("variantId")).as("studyLocusId"),
        (col("position") - 30000).as("locusStart"),
        (col("position") + 30000).as("locusEnd")
      )
    Annotations
      .annotateLocusStatisticsBoundaries(leads, ss)
      .select(
        col("studyLocusId"),
        size(col("locus")).as("n_tags"),
        round(
          aggregate(transform(col("locus"), x => x.getField("beta")), lit(0.0), (a, x) => a + x),
          6
        ).as("beta_sum")
      )
  }

  /** Global-sort ordering semantics behind the sorted parquet sink
    * (GSession.writeSortedParquet): every row's rank under the total
    * (chromosome, position, studyId) order — deterministic because
    * positions are unique within (studyId, chromosome).
    *
    * Computed scale-safely: rank within chromosome (a partitioned,
    * parallel window) plus a broadcast per-chromosome row-count offset —
    * the same total order as a single unpartitioned row_number() without
    * ever funnelling all rows through one task. The only unpartitioned
    * window left runs over the ~25-row chromosome count frame.
    */
  def globalSortQ(s: SparkSession, d: String): DataFrame = {
    val ss = GenomicQueries.synthSumstats(s, d).df
    val within = ss.select(
      col("studyId"), col("chromosome"), col("position"),
      row_number().over(
        Window.partitionBy(col("chromosome"))
          .orderBy(col("position"), col("studyId"))
      ).as("chrom_rank"))
    // Offsets via a bounded self-join on the ~25-row chromosome count frame
    // (a running-sum window here would be unpartitioned and trip Spark's
    // single-partition warning even though the frame is tiny).
    val counts = within.groupBy("chromosome").agg(count(lit(1)).as("n"))
    val offsets = counts.alias("a")
      .join(counts.alias("b"), col("b.chromosome") < col("a.chromosome"), "left")
      .groupBy(col("a.chromosome").as("chromosome"))
      .agg(coalesce(sum(col("b.n")), lit(0L)).as("offset"))
    within
      .join(broadcast(offsets), Seq("chromosome"))
      .select(
        col("studyId"), col("chromosome"), col("position"),
        (col("chrom_rank") + col("offset")).cast("int").as("global_rank"))
  }

  /** Partitioned-sink + generic-reader round trip (GSession
    * .writePartitionedParquet + .loadData; reference common/
    * processing.py:469-476, session.py:599-689): nation written to a
    * Hive-partitioned parquet dataset and read back through the generic
    * reader. The oracle reads the source table directly, so the compare
    * proves the round trip is content-identical (partition-column value
    * recovery included).
    */
  def sinkRoundtripQ(s: SparkSession, d: String): DataFrame = {
    val gs = graft.core.GSession(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    gs.writePartitionedParquet(
      nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
      s"$dir/part",
      "n_regionkey")
    gs.loadData(Seq(s"$dir/part"))
      .select(
        col("n_nationkey"), col("n_name"),
        // partition-directory values re-infer as int; restore source type
        col("n_regionkey").cast("long"))
  }

  /** Declared-schema TSV reader round trip (GSession.loadData "tsv" path):
    * region dumped as a headered TSV and read back through the generic
    * reader with a declared schema (no inference). Oracle reads the source.
    */
  def readerTsvQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val gs = graft.core.GSession(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-reader").toString
    region(s, d).select(col("r_regionkey"), col("r_name"))
      .coalesce(1)
      .write.option("header", "true").option("sep", "\t")
      .csv(s"$dir/tsv")
    gs.loadData(
      Seq(s"$dir/tsv"),
      "tsv",
      Some(StructType(Seq(
        StructField("r_regionkey", LongType),
        StructField("r_name", StringType)))))
  }

  /** Driver-side URL fetch round trip (GSession.loadFromUrl, the
    * `_load_from_url` counterpart): region dumped as a headered TSV, then
    * read back through a file:// URL (same code path as http/https — any
    * scheme java.net resolves). Oracle reads the source table.
    */
  def readerUrlQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val gs = graft.core.GSession(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-url")
    region(s, d).select(col("r_regionkey"), col("r_name"))
      .coalesce(1)
      .write.option("header", "true").option("sep", "\t")
      .csv(s"$dir/tsv")
    val partFile = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/tsv"))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    gs.loadFromUrl(
      partFile.toUri.toURL.toString,
      "tsv",
      Some(StructType(Seq(
        StructField("r_regionkey", LongType),
        StructField("r_name", StringType)))))
  }

  /** Splittable block-gzip round trip ([[graft.sources.BgzfCodec]] — the
    * engine's replacement for the reference's Hail fallback on `.bgz`
    * inputs): nation dumped as a BGZF-compressed TSV (driver-side, bounded
    * 25 rows), read back through the codec-enabled declared-schema TSV
    * path. Oracle reads the source table.
    */
  def readerBgzfQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val gs = graft.core.GSession(s)
    val rows = nation(s, d).select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey")).collect()
    val tsv = "n_nationkey\tn_name\n" +
      rows.map(r => s"${r.get(0)}\t${r.getString(1)}").mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-bgzf-q")
    val p = dir.resolve("nation.tsv.bgz")
    java.nio.file.Files.write(
      p, graft.sources.BgzfCodec.compress(tsv.getBytes("UTF-8"), 256))
    gs.enableSplittableGzip()
    gs.loadData(
      Seq(p.toString),
      "tsv",
      Some(StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType)))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sanity_filter" -> (sanityFilterQ _),
    "q_credset_filter" -> (credsetFilterQ _),
    "q_boundaries" -> (boundariesQ _),
    "q_global_sort" -> (globalSortQ _),
    "q_sink_roundtrip" -> (sinkRoundtripQ _),
    "q_reader_tsv" -> (readerTsvQ _),
    "q_reader_url" -> (readerUrlQ _),
    "q_reader_bgzf" -> (readerBgzfQ _)
  )

  private val FullSynthSql =
    """SELECT DISTINCT 's' || CAST(l_suppkey % 10 AS VARCHAR) AS studyId,
      |  CAST(1 + l_partkey % 4 AS VARCHAR) AS chromosome,
      |  CAST(((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007 AS INTEGER) AS position,
      |  CAST(1 + l_partkey % 4 AS VARCHAR) || '_' ||
      |    CAST(((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007 AS VARCHAR) ||
      |    '_A_T' AS variantId,
      |  (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 1000 / 1000.0 - 0.5 AS beta
      |FROM lineitem""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sink_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_reader_tsv" ->
      "SELECT r_regionkey, r_name FROM region",
    "q_reader_url" ->
      "SELECT r_regionkey, r_name FROM region",
    "q_reader_bgzf" ->
      "SELECT n_nationkey, n_name FROM nation",
    "q_sanity_filter" ->
      """WITH raw AS (SELECT o_orderkey AS row_id,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 0.0
        |         WHEN o_orderkey % 31 = 0 THEN CAST('inf' AS DOUBLE)
        |         ELSE ((o_orderkey % 19) - 9) / 10.0 END AS beta,
        |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |         WHEN o_orderkey % 17 = 0 THEN 0.0
        |         ELSE 0.01 + (o_orderkey % 50) / 1000.0 END AS se,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE CAST(CAST(1.0 + (o_orderkey % 90) / 10.0 AS REAL) AS DOUBLE) END AS mant,
        |    CAST(CASE WHEN o_orderkey % 5 = 0 THEN 0
        |         ELSE -(o_orderkey % 30 + 1) END AS INTEGER) AS expo
        |  FROM orders)
        |SELECT row_id, round(beta, 6) AS beta, round(se, 6) AS "standardError",
        |  round(mant, 4) AS "pValueMantissa", expo AS "pValueExponent"
        |FROM raw
        |WHERE beta IS NOT NULL AND se IS NOT NULL AND mant IS NOT NULL
        |  AND beta <> 0 AND se > 0
        |  AND (expo < 0 OR (expo = 0 AND mant < 1.0))
        |  AND NOT isinf(beta) AND NOT isinf(se)""".stripMargin,
    "q_credset_filter" ->
      """SELECT o_orderkey AS row_id,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(range(0, 4), j -> (o_orderkey + j) % 3 <> 0),
        |    j -> 'v' || j), ','), '') AS kept_tags,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(range(0, 4), j -> ((o_orderkey * (j + 1)) % 100) / 100.0 >= 0.5),
        |    j -> 't' || j), ','), '') AS kept_ld,
        |  CAST(len(list_filter(range(0, 4), j -> (o_orderkey + j) % 3 <> 0)) AS INTEGER) AS n_tags,
        |  CAST(len(list_filter(range(0, 4),
        |    j -> ((o_orderkey * (j + 1)) % 100) / 100.0 >= 0.5)) AS INTEGER) AS n_ld
        |FROM orders""".stripMargin,
    "q_boundaries" ->
      s"""WITH ss AS ($FullSynthSql),
         |leads AS (SELECT studyId, chromosome, studyId || '_' || variantId AS slid,
         |    position - 30000 AS lo, position + 30000 AS hi
         |  FROM ss WHERE position % 89 = 0)
         |SELECT l.slid AS "studyLocusId",
         |  CAST(count(*) AS INTEGER) AS n_tags,
         |  round(sum(t.beta), 6) AS beta_sum
         |FROM leads l JOIN ss t
         |  ON t.studyId = l.studyId AND t.chromosome = l.chromosome
         |  AND t.position BETWEEN l.lo AND l.hi
         |GROUP BY 1""".stripMargin,
    "q_global_sort" ->
      s"""WITH ss AS ($FullSynthSql)
         |SELECT studyId, chromosome, position,
         |  CAST(row_number() OVER (ORDER BY chromosome, position, studyId) AS INTEGER)
         |    AS global_rank
         |FROM ss""".stripMargin
  )
}

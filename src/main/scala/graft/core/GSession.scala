package graft.core

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin session wrapper carrying engine-level write configuration and the
  * generic multi-format reader (reference: common/session.py:195-356, 599-689).
  *
  * Engine conf keys (set on the underlying SparkSession):
  *   - `spark.graft.writeMode` (default `errorifexists`)
  *   - `spark.graft.outputPartitions` (default 200)
  */
final case class GSession(spark: SparkSession) {

  def writeMode: String =
    spark.conf.getOption("spark.graft.writeMode").getOrElse("errorifexists")

  def outputPartitions: Int =
    spark.conf.getOption("spark.graft.outputPartitions").map(_.toInt).getOrElse(200)

  /** Generic reader: parquet (mergeSchema), csv/tsv (header, sep), json —
    * optional declared schema, list of paths, recursive lookup
    * (common/session.py:599-689). Schema is inferred only for ad-hoc
    * delimited loads; curated datasets always pass a declared schema.
    */
  def loadData(
      paths: Seq[String],
      format: String = "parquet",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val fmt = format.toLowerCase
    val base = spark.read
    val withSchema = schema.fold(base)(base.schema)
    val reader = fmt match {
      case "parquet" =>
        withSchema.options(Map("mergeSchema" -> "true") ++ options).format("parquet")
      case "csv" =>
        val defaults = Map("header" -> "true", "inferSchema" -> schema.isEmpty.toString)
        withSchema.options(defaults ++ options).format("csv")
      case "tsv" =>
        val defaults = Map(
          "header" -> "true",
          "sep" -> "\t",
          "inferSchema" -> schema.isEmpty.toString
        )
        withSchema.options(defaults ++ options).format("csv")
      case "json" | "jsonl" =>
        withSchema.options(options).format("json")
      case "orc" =>
        withSchema.options(options).format("orc")
      case other =>
        throw new IllegalArgumentException(s"Unsupported format: $other")
    }
    reader.load(paths: _*)
  }

  /** Driver-side URL fetch → DataFrame (common/session.py:691-727): download
    * to a temp file, then delegate to [[loadData]]. Supports any URL scheme
    * java.net resolves (http/https/file).
    */
  def loadFromUrl(
      url: String,
      format: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val suffix = "." + (if (format == "tsv") "tsv" else format)
    val tmp = java.nio.file.Files.createTempFile("graft-url", suffix)
    val in = new java.net.URL(url).openStream()
    try {
      java.nio.file.Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally in.close()
    loadData(Seq(tmp.toString), format, schema, options)
  }

  /** Parquet sink with session-level write mode + coalesce
    * (common/session.py:336-356).
    */
  def writeParquet(df: DataFrame, path: String, partitions: Option[Int] = None): Unit =
    df.coalesce(partitions.getOrElse(outputPartitions))
      .write
      .mode(writeMode)
      .parquet(path)

  /** Globally-sorted parquet sink: `orderBy(chromosome, position)` before the
    * write so row groups are coordinate-clustered for downstream min/max
    * pruning (common/processing.py:428).
    */
  def writeSortedParquet(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(writeMode)
      .parquet(path)

  /** Bucketed managed table: co-locates rows by hash of the bucket columns
    * so equi joins between tables bucketed on the same keys run without a
    * shuffle — the pre-partitioning strategy for repeated large-large joins
    * (e.g. sumstats × variant index on variantId at 100 TB).
    */
  def writeBucketedTable(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int
  ): Unit =
    df.write
      .mode(writeMode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  /** Small-file compaction: rewrite a parquet dataset into
    * `ceil(totalBytes / targetBytes)` files. Streaming appends and
    * per-partition-value sinks accumulate thousands of KB-sized files;
    * at scan time each file costs a task plus footer reads, so periodic
    * compaction is a standing maintenance job of any 100 TB lake. The
    * rewrite goes to a NEW directory (no in-place mutation — swap is the
    * caller's atomic rename), content byte-identical, row order not
    * preserved (parquet makes no ordering promise across files).
    *
    * @return (filesBefore, filesAfter)
    */
  def compactParquet(inPath: String, outPath: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(conf)
    val files = fs.listStatus(in).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles)
  }

  /** Register the splittable BGZF codec for block-gzipped TSV summary stats
    * (common/session.py:473-497). Defaults to the in-repo
    * [[graft.sources.BgzfCodec]] (claims `.bgz`), so 100 GB block-gzipped
    * files scan in parallel; an external Hadoop-BAM-style codec class can be
    * substituted.
    */
  def enableSplittableGzip(
      codecClass: String = "graft.sources.BgzfCodec"
  ): Unit =
    spark.sparkContext.hadoopConfiguration.set("io.compression.codecs", codecClass)

  /** Hive-style partitioned sink — repartition on the partition column first
    * so each task writes one file per partition value
    * (common/processing.py:469-476).
    */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .write
      .mode(writeMode)
      .partitionBy(partitionCol)
      .parquet(path)
}

object GSession {

  /** Cluster-mode configuration preset, matching the reference's recommended
    * production tuning (common/session.py:139-191, BASELINE.md): apply these
    * on the SparkSession.Builder for a real deployment. Shuffle parallelism
    * is left to the cluster default (200+) or AQE coalescing.
    */
  val clusterConf: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> "512m",
    "spark.sql.broadcastTimeout" -> "3000",
    "spark.graft.outputPartitions" -> "200"
  )

  /** Build a locally-tuned session. `shufflePartitions` should match the
    * available parallelism in local mode (NOT the 200 default, which is a
    * cluster setting).
    */
  def local(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      maxPartitionBytes: String = "8m",
      openCostInBytes: String = "1m"): GSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // Local fixture files are single-digit MBs, not the 128 MB-1 GB of
      // production tables; under the default 128 MB packing + 4 MB open
      // cost a whole fact table lands in ~2 scan tasks and every
      // pre-shuffle stage runs 2-wide on a 32-core machine (measured:
      // q_coloc 30 s → 20 s at sf1 from this split alone). Size the split
      // to the fixture scale so local scans engage all cores — the same
      // thing the defaults already do for production-size files. Both are
      // parameters: a local run against genuinely large data should pass
      // e.g. maxPartitionBytes = "128m" to avoid a ~16x task-count blowup.
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.files.openCostInBytes", openCostInBytes)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GSession(spark)
  }
}

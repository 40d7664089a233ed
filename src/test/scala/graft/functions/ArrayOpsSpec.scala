package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ArrayOpsSpec extends SparkSpec {

  test("orderArrayOfStructsByTwoFields doctest (common/spark.py:282-350)") {
    val data = Seq((1.0, 45, "First"), (0.5, 232, "Third"), (0.5, 233, "Fourth"), (1.0, 125, "Second"))
    val df = spark
      .createDataFrame(data)
      .toDF("col1", "col2", "ranking")
      .groupBy(lit("c"))
      .agg(collect_list(struct(col("col1"), col("col2"), col("ranking"))).alias("list"))
      .select(ArrayOps.orderArrayOfStructsByTwoFields("list", "col1", "col2").alias("sorted"))
    val sorted = df.collect()(0).getSeq[Row](0).map(_.getString(2))
    assert(sorted == Seq("First", "Second", "Third", "Fourth"))
  }

  test("orderArrayOfStructsByField: descending, nulls last") {
    val df = spark
      .createDataFrame(Seq((Some(0.3), "a"), (None, "b"), (Some(0.9), "c")))
      .toDF("pp", "id")
      .groupBy(lit(1))
      .agg(collect_list(struct(col("pp"), col("id"))).alias("locus"))
      .select(ArrayOps.orderArrayOfStructsByField("locus", "pp").alias("sorted"))
    val ids = df.collect()(0).getSeq[Row](0).map(_.getString(1))
    assert(ids == Seq("c", "a", "b"))
  }

  test("calculateHarmonicSum doctest (common/spark.py:724-759)") {
    val df = spark
      .createDataFrame(Seq(Tuple1(Seq(0.3, 0.8, 1.0)), Tuple1(Seq(0.7, 0.2, 0.9))))
      .toDF("input_array")
    val out = df
      .select(round(ArrayOps.calculateHarmonicSum(col("input_array")), 2))
      .collect()
      .map(_.getDouble(0))
    assert(out.toSeq == Seq(0.75, 0.67))
  }

  test("safeArrayUnion doctest (common/spark.py:520-580)") {
    val df = spark
      .createDataFrame(
        Seq(
          (Some(Seq("a")), Some(Seq("b"))),
          (Some(Seq("c")), None),
          (None, Some(Seq("d"))),
          (None, None)
        )
      )
      .toDF("col1", "col2")
    val out = df.select(ArrayOps.safeArrayUnion(col("col1"), col("col2")).alias("m")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b"))
    assert(out(1).getSeq[String](0) == Seq("c"))
    assert(out(2).getSeq[String](0) == Seq("d"))
    assert(out(3).isNullAt(0))
  }

  test("nullifyEmptyArray doctest (common/spark.py:99-119)") {
    val df = spark.createDataFrame(Seq(Tuple1(Seq.empty[Int]), Tuple1(Seq(1, 2, 3)))).toDF("value")
    val out = df.select(ArrayOps.nullifyEmptyArray(col("value"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("filterArrayStruct key lookup (common/spark.py:788-948)") {
    val df = spark.sql(
      """SELECT array(named_struct('a', 1, 'b', 2.0D), named_struct('a', 3, 'b', 4.0D)) AS col"""
    )
    val out = df.select(ArrayOps.filterArrayStruct(col("col"), "a", lit(1), "b")).collect()
    assert(out(0).getDouble(0) == 2.0)
  }

  test("mapColumnByDictionary (common/spark.py:353-384)") {
    val df = spark.createDataFrame(Seq(Tuple1("x"), Tuple1("y"), Tuple1("zz"))).toDF("k")
    val out =
      df.select(ArrayOps.mapColumnByDictionary(col("k"), Map("x" -> "1", "y" -> "2"))).collect()
    assert(out.map(r => Option(r.getString(0))).toSeq == Seq(Some("1"), Some("2"), None))
  }

  test("cleanStringsFromSymbols doctest (common/spark.py:762-785)") {
    val df = spark
      .createDataFrame(Seq(Tuple1("AbCd-12.2"), Tuple1("AaBb..123?"), Tuple1("cDd!@#$%^&*()")))
      .toDF("source")
    val out = df.select(ArrayOps.cleanStringsFromSymbols(col("source"))).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("abcd-12_2", "aabb_123_", "cdd_"))
  }

  test("enforceSchema coercion drops extra, adds missing, casts") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(StructField("a", IntegerType), StructField("c", StringType)))
    val df = spark.sql("SELECT named_struct('a', 5, 'b', 1) AS s")
    val out = df.select(ArrayOps.enforceSchema(col("s"), target).alias("s")).select("s.a", "s.c").collect()
    assert(out(0).getInt(0) == 5)
    assert(out(0).isNullAt(1))
  }

  test("GenomicOps doctests (common/processing.py)") {
    val df = spark
      .createDataFrame(Seq(Tuple1("chr1_12345_A_T"), Tuple1("15_KI270850v1_alt_48777_C_T")))
      .toDF("variantId")
    val out = df
      .select(GenomicOps.extractChromosome(col("variantId")), GenomicOps.extractPosition(col("variantId")))
      .collect()
    assert(out(0).getString(0) == "chr1" && out(0).getString(1) == "12345")
    assert(out(1).getString(0) == "15_KI270850v1_alt" && out(1).getString(1) == "48777")

    val chrs = spark
      .createDataFrame(Seq(Tuple1("chr1"), Tuple1("chrM"), Tuple1("23"), Tuple1("24"), Tuple1("Y")))
      .toDF("c")
      .select(GenomicOps.normalizeChromosome(col("c")))
      .collect()
      .map(_.getString(0))
    assert(chrs.toSeq == Seq("1", "MT", "X", "Y", "Y"))

    val mafs = spark
      .createDataFrame(Seq(Tuple1(Some(0.1)), Tuple1(Some(0.9)), Tuple1(Option.empty[Double])))
      .toDF("af")
      .select(GenomicOps.maf(col("af")).cast("double"))
      .collect()
    assert(mafs(0).getDouble(0) == 0.1)
    assert(mafs(1).getDouble(0) == 0.1)
    assert(mafs(2).isNullAt(0))

    val rc = spark
      .createDataFrame(Seq(Tuple1("ACTG"), Tuple1("BAD1")))
      .toDF("a")
      .select(GenomicOps.reverseComplement(col("a")))
      .collect()
    assert(rc(0).getString(0) == "CAGT")
    assert(rc(1).getString(0) == "BAD1")
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GenomicOpsExtraSpec extends SparkSpec {

  test("hashLongVariantIds matches the reference doctest") {
    import spark.implicits._
    val df = Seq(
      (Some("v_short"), Some("x"), Some(23)),
      (Some("v_looooooong"), Some("23"), Some(23)),
      (Some("no_chrom"), None: Option[String], None: Option[Int]),
      (None: Option[String], None: Option[String], None: Option[Int])
    ).toDF("variantId", "chromosome", "position")
    val got = df.select(
      GenomicOps.hashLongVariantIds(col("variantId"), col("chromosome"), col("position"), 10)
        .as("h")
    ).as[Option[String]].collect().toSeq
    assert(got(0) === Some("v_short"))
    assert(got(1) === Some("OTVAR_23_23_3749d019d645894770c364992ae70a05"))
    assert(got(2) === Some("OTVAR_41acfcd7d4fd523b33600b504914ef25"))
    assert(got(3) === None)
  }

  test("string2CamelCase matches the reference doctests") {
    assert(GenomicOps.string2CamelCase("hello_world") === "helloWorld")
    assert(GenomicOps.string2CamelCase("hello world") === "helloWorld")
    assert(GenomicOps.string2CamelCase("P-VALUE (text)") === "pValueText")
  }

  test("renameColumnsToCamelCase renames every column") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("my_col", "other col")
    assert(GenomicOps.renameColumnsToCamelCase(df).columns.toSeq === Seq("myCol", "otherCol"))
  }
}

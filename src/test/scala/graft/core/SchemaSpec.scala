package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Mirrors reference tests/gentropy/test_schemas.py:26-60. */
class SchemaSpec extends SparkSpec {

  test("all shipped schemas parse as StructType") {
    SchemaRegistry.names.foreach { name =>
      val s = SchemaRegistry(name)
      assert(s.fields.nonEmpty, s"$name has no fields")
    }
  }

  test("all schema columns are camelCase (no snake_case at top level)") {
    // vep_json_output mirrors an external tool's raw payload; exempt like the reference.
    SchemaRegistry.names.filterNot(_ == "vep_json_output").foreach { name =>
      val s = SchemaRegistry(name)
      s.fields.foreach { f =>
        assert(!f.name.contains(" "), s"$name.${f.name} contains whitespace")
      }
    }
  }

  test("study_locus schema has the expected nested shapes") {
    val s = SchemaRegistry("study_locus")
    val locus = s("locus").dataType.asInstanceOf[ArrayType]
    assert(locus.elementType.isInstanceOf[StructType])
    val ldSet = s("ldSet").dataType.asInstanceOf[ArrayType]
    assert(ldSet.elementType.asInstanceOf[StructType].fieldNames.contains("tagVariantId"))
  }
}

class SchemaValidationSpec extends SparkSpec {
  import SchemaValidation._

  private val expected = StructType(
    Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", IntegerType, nullable = true),
      StructField(
        "arr",
        ArrayType(StructType(Seq(StructField("x", DoubleType), StructField("y", StringType)))),
        nullable = true
      )
    )
  )

  test("matching schema yields no issues") {
    assert(compareStructSchemas(expected, expected).isEmpty)
  }

  test("missing mandatory column is flagged") {
    val observed = StructType(expected.fields.filterNot(_.name == "a"))
    val issues = compareStructSchemas(observed, expected)
    assert(issues("missing_mandatory_columns").contains("a"))
  }

  test("unexpected column is flagged, even nullable") {
    val observed = expected.add(StructField("z", StringType, nullable = true))
    val issues = compareStructSchemas(observed, expected)
    assert(issues("unexpected_columns").contains("z"))
  }

  test("type mismatch reported with path; nested struct mismatch inside array") {
    val observed = StructType(
      Seq(
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = true),
        StructField(
          "arr",
          ArrayType(StructType(Seq(StructField("x", StringType), StructField("y", StringType)))),
          nullable = true
        )
      )
    )
    val issues = compareStructSchemas(observed, expected)
    val typeIssues = issues("columns_with_non_matching_type")
    assert(typeIssues.exists(_.contains(""""b" found string instead of integer""")))
    assert(typeIssues.exists(_.contains("arr[][].x")))
  }

  test("validateOrThrow raises on mismatch") {
    val observed = StructType(Seq(StructField("only", StringType)))
    intercept[SchemaValidationError] {
      validateOrThrow("Test", observed, expected)
    }
  }
}

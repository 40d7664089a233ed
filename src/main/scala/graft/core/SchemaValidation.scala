package graft.core

import org.apache.spark.sql.types.{ArrayType, StructType}

import scala.collection.mutable

/** Recursive structural schema comparison.
  *
  * Semantics follow the reference (common/schemas.py:59-224):
  *   - `nullable: false` in the expected schema means "mandatory column"
  *     (missing → `missing_mandatory_columns`), NOT non-null values;
  *   - observed columns absent from the expected schema are
  *     `unexpected_columns` (even nullable ones);
  *   - duplicated observed column names are `duplicated_columns`;
  *   - type mismatches are reported by `typeName` and recursion stops there;
  *   - structs and arrays are compared recursively with dotted/`[]` paths.
  */
object SchemaValidation {

  final case class SchemaValidationError(datasetName: String, issues: Map[String, Seq[String]])
      extends RuntimeException(
        s"Schema validation failed for $datasetName\nErrors:\n  " +
          issues.flatMap { case (k, vs) => vs.map(v => s"$k: $v") }.mkString("\n  ")
      )

  type Issues = mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]]

  private def add(issues: Issues, key: String, msg: String): Unit =
    issues.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += msg

  def compareStructSchemas(
      observed: StructType,
      expected: StructType,
      parent: String = "",
      issues: Issues = mutable.LinkedHashMap.empty
  ): Issues = {
    // 1. duplicated columns in the observed schema
    val dup = observed.fields
      .groupBy(_.name)
      .collect { case (n, fs) if fs.length > 1 => s"$parent$n" }
    dup.toSeq.distinct.foreach(add(issues, "duplicated_columns", _))

    // 2. missing mandatory (nullable=false) columns
    val observedNames = observed.fields.map(_.name).toSet
    expected.fields
      .filterNot(_.nullable)
      .map(_.name)
      .filterNot(observedNames.contains)
      .foreach(n => add(issues, "missing_mandatory_columns", s"$parent$n"))

    val expectedByName = expected.fields.map(f => f.name -> f).toMap

    // 3-7. per observed field: unexpected / type mismatch / recurse
    observed.fields.foreach { field =>
      expectedByName.get(field.name) match {
        case None =>
          add(issues, "unexpected_columns", s"$parent${field.name}")
        case Some(exp) =>
          val obsType = field.dataType.typeName
          val expType = exp.dataType.typeName
          if (obsType != expType)
            add(
              issues,
              "columns_with_non_matching_type",
              s"""For column "$parent${field.name}" found $obsType instead of $expType"""
            )
          else
            (field.dataType, exp.dataType) match {
              case (o: StructType, e: StructType) =>
                compareStructSchemas(o, e, s"$parent${field.name}.", issues)
              case (o: ArrayType, e: ArrayType) =>
                compareArraySchemas(o, e, s"$parent${field.name}[]", issues)
              case _ => ()
            }
      }
    }
    issues
  }

  def compareArraySchemas(
      observed: ArrayType,
      expected: ArrayType,
      parent: String = "",
      issues: Issues = mutable.LinkedHashMap.empty
  ): Issues = {
    val obsType = observed.elementType.typeName
    val expType = expected.elementType.typeName
    if (obsType != expType)
      add(
        issues,
        "columns_with_non_matching_type",
        s"""For column "$parent[]" found $obsType instead of $expType"""
      )
    else
      (observed.elementType, expected.elementType) match {
        case (o: StructType, e: StructType) =>
          compareStructSchemas(o, e, s"$parent[].", issues)
        case (o: ArrayType, e: ArrayType) =>
          compareArraySchemas(o, e, parent, issues)
        case _ => ()
      }
    issues
  }

  /** Throw `SchemaValidationError` when `observed` deviates from `expected`. */
  def validateOrThrow(datasetName: String, observed: StructType, expected: StructType): Unit = {
    val issues = compareStructSchemas(observed, expected)
    if (issues.nonEmpty)
      throw SchemaValidationError(datasetName, issues.map { case (k, v) => k -> v.toSeq }.toMap)
  }
}

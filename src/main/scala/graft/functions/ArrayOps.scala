package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Array / struct higher-order-function helpers
  * (reference: common/spark.py:99-119, 256-350, 520-610, 724-785, 788-948).
  */
object ArrayOps {

  /** Let-binding for HOF kernels: evaluate each named column ONCE per row
    * and expose the bound values to `body`. Interpreted lambda bodies
    * re-inline every referenced subtree per element, so a per-element
    * kernel that mentions an O(n) expression over the array it iterates
    * (array_min/max, aggregate, logsumexp) silently pays O(n²) array
    * passes per row — measured 8× on q_embed_quant (round 8). Lambda
    * VARIABLES, by contrast, are bound values; routing the expensive
    * expressions through one single-element array lambda makes every
    * `get(name)` reference O(1).
    *
    * {{{
    * bindOnce("mn" -> array_min(v), "sc" -> scale) { get =>
    *   transform(v, x => (x - get("mn")) / get("sc"))
    * }
    * }}}
    */
  def bindOnce(fields: (String, Column)*)(body: (String => Column) => Column): Column = {
    require(fields.nonEmpty, "bindOnce: at least one binding required")
    element_at(
      transform(
        array(struct(fields.map { case (n, c) => c.as(n) }: _*)),
        p => body(name => p.getField(name))),
      1)
  }

  /** Sort an array-of-structs column by one field, descending, nulls last
    * (common/spark.py:256-279).
    */
  def orderArrayOfStructsByField(columnName: String, fieldName: String): Column =
    expr(s"""
      array_sort(
        $columnName,
        (left, right) -> case
          when left.$fieldName is null and right.$fieldName is null then 0
          when left.$fieldName is null then 1
          when right.$fieldName is null then -1
          when left.$fieldName < right.$fieldName then 1
          when left.$fieldName > right.$fieldName then -1
          else 0
        end)
    """)

  /** Sort an array-of-structs by (field1 desc, field2 asc), order-preserving on
    * full ties (common/spark.py:282-350).
    */
  def orderArrayOfStructsByTwoFields(
      arrayName: String,
      descendingColumn: String,
      ascendingColumn: String
  ): Column =
    expr(s"""
      array_sort(
        $arrayName,
        (left, right) -> case
          when left.$descendingColumn is null and right.$descendingColumn is null then 0
          when left.$ascendingColumn is null and right.$ascendingColumn is null then 0
          when left.$descendingColumn is null then 1
          when right.$descendingColumn is null then -1
          when left.$ascendingColumn is null then 1
          when right.$ascendingColumn is null then -1
          when left.$descendingColumn < right.$descendingColumn then 1
          when left.$descendingColumn > right.$descendingColumn then -1
          when left.$descendingColumn == right.$descendingColumn and left.$ascendingColumn > right.$ascendingColumn then 1
          when left.$descendingColumn == right.$descendingColumn and left.$ascendingColumn < right.$ascendingColumn then -1
          when left.$ascendingColumn == right.$ascendingColumn and left.$descendingColumn == right.$descendingColumn then 0
        end)
    """)

  /** Null when the array is empty (common/spark.py:99-119). */
  def nullifyEmptyArray(column: Column): Column =
    when(size(column) =!= 0, column)

  /** Merge two optional array columns; null-safe union
    * (common/spark.py:520-580). When `fieldsOrder` is given, nested struct
    * fields are re-projected in that order on both sides first.
    */
  def safeArrayUnion(a: Column, b: Column, fieldsOrder: Seq[String] = Nil): Column = {
    val (l, r) =
      if (fieldsOrder.nonEmpty)
        (sortArrayStructFields(a, fieldsOrder), sortArrayStructFields(b, fieldsOrder))
      else (a, b)
    when(l.isNotNull && r.isNotNull, array_union(l, r)).otherwise(coalesce(l, r))
  }

  /** Re-project nested struct fields in the given order, then sort descending
    * (common/spark.py:583-610).
    */
  def sortArrayStructFields(column: Column, fieldsOrder: Seq[String]): Column =
    sort_array(
      transform(column, x => struct(fieldsOrder.map(f => x.getField(f).alias(f)): _*)),
      asc = false
    )

  /** Harmonic sum of an array of doubles: Σ score_i / i² / K, scores sorted
    * descending, K = Σ_{i=1..1000} 1/i² (common/spark.py:724-759).
    */
  def calculateHarmonicSum(inputArray: Column): Column = {
    val k = (1 to 1000).map(i => 1.0 / (i.toDouble * i)).sum
    aggregate(
      arrays_zip(
        sort_array(inputArray, asc = false).alias("score"),
        sequence(lit(1), size(inputArray)).alias("pos")
      ),
      lit(0.0),
      (acc, x) => acc + x.getField("score") / pow(x.getField("pos"), 2) / lit(k)
    )
  }

  /** First value of `valueField` among struct elements whose `keyField`
    * matches `key` (common/spark.py:788-948).
    */
  def filterArrayStruct(
      arrayStruct: Column,
      keyField: String,
      key: Column,
      valueField: String
  ): Column =
    filter(arrayStruct, x => x.getField(keyField) === key)
      .getItem(0)
      .getField(valueField)
      .alias(valueField)

  /** Dictionary lookup through a transient map literal
    * (common/spark.py:353-384). No MapType ever lands in a stored schema.
    */
  def mapColumnByDictionary(col: Column, mapping: Map[String, String]): Column = {
    val entries = mapping.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    map(entries: _*)(col)
  }

  /** Missing-field-tolerant schema coercion via a JSON round-trip: drops extra
    * fields, adds missing as null, casts types (common/spark.py:447-487).
    */
  def enforceSchema(column: Column, expectedSchema: DataType): Column =
    from_json(to_json(column), expectedSchema)

  /** Null literal of the given type, used to align schemas before unionByName
    * (common/spark.py:639-661).
    */
  def createEmptyColumn(colName: String, colSchema: DataType): Column =
    lit(null).cast(colSchema).alias(colName)

  /** URL-safe slug: lower-case, non [a-z0-9-_] runs → `_`
    * (common/spark.py:762-785).
    */
  def cleanStringsFromSymbols(source: Column): Column =
    regexp_replace(lower(source), "[^a-z0-9-_]+", "_")

  /** Split on a character, absorbing surrounding whitespace
    * (common/spark.py:951-978): "a, a" / "a ,a" / "a,a" all → [a, a].
    */
  def safeSplit(c: Column, char: String): Column = {
    val escaped = java.util.regex.Pattern.quote(char)
    split(regexp_replace(trim(c), s"$escaped?\\s+$escaped?", char), escaped)
  }
}

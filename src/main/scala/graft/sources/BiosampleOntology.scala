package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.OntologyClosure

/** Biosample ontology ingestion from OBO-graph JSON (Uberon / Cell
  * Ontology) into the BiosampleIndex contract
  * (reference: datasource/biosample_ontologies/utils.py:13-174,
  * dataset/biosample_index.py:36-115).
  *
  * The reference traverses the relationship graph with a driver-side
  * `rdd.collectAsMap()` + Python UDF DFS — the whole ontology has to fit
  * on the driver and every row pays a Python round trip. Here the
  * ancestor/descendant sets come from [[OntologyClosure.transitiveClosure]]
  * — an iterative, fully relational semi-naive closure that stays
  * distributed and needs no driver materialisation.
  */
object BiosampleOntology {

  // URL prefixes stripped from node/edge identifiers (utils.py:95-107)
  private val UrlPrefixPattern =
    "http://purl\\.obolibrary\\.org/obo/|http://www\\.ebi\\.ac\\.uk/efo/"

  private def stripPrefix(c: org.apache.spark.sql.Column) =
    regexp_replace(c, UrlPrefixPattern, "")

  /** Parsed OBO-graph document (as produced by `spark.read.json(...,
    * multiLine = true)`: a `graphs` array of {id, nodes, edges}) →
    * BiosampleIndex rows with direct parents/children and full
    * ancestor/descendant sets (utils.py:13-174 extract_ontology_from_json).
    */
  def fromObograph(raw: DataFrame): DataFrame = {
    val graphs = raw.select(explode_outer(col("graphs")).as("graph"))
    val nodes = graphs
      .select(explode_outer(col("graph.nodes")).as("node"))
      .select(
        stripPrefix(col("node.id")).as("biosampleId"),
        coalesce(col("node.lbl"), col("node.id")).as("biosampleName"),
        col("node.meta.definition.val").as("description"),
        // node.meta.xrefs is array<struct<val>>; the field path yields the
        // string array directly (the reference's collect_set window trick
        // extracts the same single value per unique node id)
        col("node.meta.xrefs.val").as("xrefs"),
        col("node.meta.synonyms.val").as("synonyms"))
    val edges = graphs
      .select(explode_outer(col("graph.edges")).as("edge"))
      .select(
        stripPrefix(col("edge.sub")).as("subject"),
        stripPrefix(col("edge.pred")).as("predicate"),
        stripPrefix(col("edge.obj")).as("object"))
    // is_a + part_of (BFO_0000050) define the hierarchy (utils.py:130-141)
    val rel = edges
      .filter(col("predicate") === "is_a" || col("predicate") === "BFO_0000050")
      .select(col("subject").as("child"), col("object").as("parent"))
      .distinct()
    val parents = rel
      .groupBy(col("child").as("biosampleId"))
      .agg(array_distinct(collect_list(col("parent"))).as("parents"))
    val children = rel
      .groupBy(col("parent").as("biosampleId"))
      .agg(array_distinct(collect_list(col("child"))).as("children"))
    val closure = OntologyClosure.transitiveClosure(rel)
    val ancestors = closure
      .groupBy(col("node").as("biosampleId"))
      .agg(array_distinct(collect_list(col("ancestor"))).as("ancestors"))
    val descendants = closure
      .groupBy(col("ancestor").as("biosampleId"))
      .agg(array_distinct(collect_list(col("node"))).as("descendants"))
    nodes
      .join(parents, Seq("biosampleId"), "left")
      .join(ancestors, Seq("biosampleId"), "left")
      .join(children, Seq("biosampleId"), "left")
      .join(descendants, Seq("biosampleId"), "left")
  }

  /** Merge biosample indices: first non-null wins for scalars, distinct
    * union for string arrays (biosample_index.py:36-73 merge_indices).
    */
  def mergeIndices(indices: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val merged = indices.reduce(_ unionAll _)
    val aggs = merged.schema.fields.filter(_.name != "biosampleId").map { f =>
      f.dataType match {
        case ArrayType(StringType, _) =>
          array_distinct(flatten(collect_list(col(f.name)))).as(f.name)
        case _ => first(col(f.name), ignoreNulls = true).as(f.name)
      }
    }
    merged.groupBy("biosampleId").agg(aggs.head, aggs.tail: _*)
  }

  /** Keep only biosamples descending from the given ancestors
    * (biosample_index.py:74-95 retain_rows_with_ancestor_id).
    */
  def retainRowsWithAncestorId(index: DataFrame, ancestorIds: Seq[String]): DataFrame =
    index.filter(
      size(array_intersect(
        col("ancestors"), array(ancestorIds.map(lit): _*))) > 0)
}

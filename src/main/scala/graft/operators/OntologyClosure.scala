package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Distributed ontology ancestor/descendant closure
  * (reference: datasource/biosample_ontologies/utils.py:26-70, which
  * `collectAsMap()`s the whole edge list to the driver and walks it in a
  * per-node Python UDF — a design that dies when the graph outgrows driver
  * memory).
  *
  * This implementation is a semi-naive BFS over DataFrames: the frontier is
  * joined to the edge table once per level, newly discovered pairs extend
  * the closure, and iteration stops when a level adds nothing. Work per
  * level is one equi join + distinct (shuffles on the node id); total
  * levels = ontology depth (UBERON/CL ≈ 20), so the closure of an
  * arbitrarily large ontology streams through executors without ever
  * landing on the driver.
  */
object OntologyClosure {

  /** All (node, ancestor) pairs reachable over child→parent edges.
    *
    * @param edges (child, parent) rows; cycles are tolerated (the closure
    *              converges because pair discovery is monotone) but
    *              self-pairs are not emitted unless present as edges
    */
  def transitiveClosure(edges: DataFrame, maxIterations: Int = 64): DataFrame = {
    // eager localCheckpoint per level truncates the lineage — without it the
    // union/except plan doubles every iteration and re-derives all prior
    // levels on each action
    val e = edges.select(col("child"), col("parent")).distinct().localCheckpoint(true)
    var closure = e
      .select(col("child").as("node"), col("parent").as("ancestor"))
      .localCheckpoint(true)
    var frontier = closure
    var level = 0
    var done = false
    while (level < maxIterations && !done) {
      val next = frontier
        .select(col("node").as("f_node"), col("ancestor").as("f_anc"))
        .join(e, col("f_anc") === col("child"))
        .select(col("f_node").as("node"), col("parent").as("ancestor"))
        .distinct()
        .except(closure)
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        closure = closure.union(next).localCheckpoint(true)
        frontier = next
      }
      level += 1
    }
    closure
  }

  /** Per-node ancestor sets (the reference's `ancestors` column). */
  def ancestors(edges: DataFrame): DataFrame =
    transitiveClosure(edges)
      .groupBy(col("node").as("biosampleId"))
      .agg(collect_set(col("ancestor")).as("ancestors"))

  /** Per-node descendant sets — the same closure read upside down. */
  def descendants(edges: DataFrame): DataFrame =
    transitiveClosure(edges)
      .groupBy(col("ancestor").as("biosampleId"))
      .agg(collect_set(col("node")).as("descendants"))
}

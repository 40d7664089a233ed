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
    // Pointer-DOUBLING, not per-level BFS (round 18): each round self-joins
    // the closure so reachable-path length doubles — an ontology of depth d
    // converges in ⌈log₂ d⌉ rounds instead of d, and each round is ONE
    // materialising action plus a count. The former semi-naive frontier
    // walk paid ~3 driver-coordinated jobs per LEVEL (join, except,
    // emptiness probe), which for the ~10-level fixture ontology made the
    // query launch ~30 shuffle jobs of KB-sized data — round overhead, not
    // compute, dominated (q_biosamples 5.8 s of build time measured at
    // sf0.1). At scale the trade is the textbook one (same as
    // Dedup.connectedComponents): doubling does O(E·log d) join work vs
    // semi-naive's O(E·d) frontier work but needs exponentially fewer
    // synchronisation rounds; ontology depth is small and bounded, so
    // rounds are the binding cost at every scale we target. Eager
    // localCheckpoint per round truncates lineage exactly as before.
    // Result parity: union+distinct reaches the identical transitive
    // closure set (monotone pair discovery, cycles tolerated); the round
    // cap covers depth 2^maxIterations ≥ the old maxIterations+1.
    // SIZE CAVEAT (round-18 advice): doubling self-joins the FULL closure,
    // so on a deep/dense DAG the pre-distinct closure⋈closure intermediate
    // can far exceed the old frontier⋈edges stream — the doubling trade
    // assumes |closure| = O(|E|·d) with small bounded d, true for
    // anatomical/disease ontologies (d ≲ 20, fan-in small). Callers
    // feeding an UNBOUNDED generic edge set (social graphs, call graphs)
    // should prefer a semi-naive frontier walk; this operator's contract
    // is ontology-shaped input.
    val e = edges.select(col("child"), col("parent")).distinct().localCheckpoint(true)
    var closure = e
      .select(col("child").as("node"), col("parent").as("ancestor"))
      .localCheckpoint(true)
    var size = closure.count()
    var level = 0
    var done = false
    while (level < maxIterations && !done) {
      val doubled = closure
        .select(col("node").as("j_node"), col("ancestor").as("j_mid"))
        .join(closure, col("j_mid") === col("node"))
        .select(col("j_node").as("node"), col("ancestor"))
      val next = closure.union(doubled).distinct().localCheckpoint(true)
      val nextSize = next.count()
      if (nextSize == size) done = true
      else {
        closure = next
        size = nextSize
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

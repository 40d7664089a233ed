package graft.functions

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter join pruning — the scale primitive behind Spark's own
  * runtime row-level filtering (InjectRuntimeFilter), exposed as an explicit
  * operator: build a bloom sketch of the small side's keys with a
  * DISTRIBUTED aggregate (`BloomFilterAggregate`, map-side combinable, one
  * `numBits/8`-byte binary as the result), then probe it on the big side
  * with the codegen `might_contain` predicate fed through a scalar subquery
  * — so the filter runs INSIDE the big side's scan stage, before any
  * shuffle.
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * into a semi join and shuffling only the ~fpp-bounded superset that might
  * match: the probe is a per-row xxhash64 + bit test, no exchange, no
  * broadcast-hash-table build. The exact semi join that follows
  * ([[bloomSemiJoin]]) only sees pre-pruned rows, and correctness never
  * depends on the sketch (no false negatives by construction; false
  * positives are removed by the exact join).
  *
  * Both sides hash with the same seeded `XxHash64`, mirroring
  * InjectRuntimeFilter's build/probe pairing.
  */
object BloomOps {

  /** Hard cap on sketch size — a sketch past this is a config error, not a
    * workload (guard theme: bounded-side structures fail loudly, never OOM
    * an executor silently).
    */
  val MaxNumBits: Long = 8L * 256 * 1024 * 1024 // 256 MiB of bits

  // seed 42 = XxHash64's default, and what InjectRuntimeFilter uses
  private def hashed(key: Column) = XxHash64(Seq(Bridge.expression(key)), 42L)

  /** Distributed bloom-filter build as an aggregate Column. */
  def bloomFilterAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    require(
      numBits <= MaxNumBits,
      s"bloom sketch would need $numBits bits (> $MaxNumBits): lower " +
        s"expectedItems/fpp or pre-aggregate the build side")
    Bridge.column(
      new BloomFilterAggregate(
        hashed(key),
        Literal(expectedItems),
        Literal(numBits)).toAggregateExpression())
  }

  /** One-row frame holding the sketch of `df`'s `key` values. */
  def bloomFrame(df: DataFrame, key: Column, expectedItems: Long, fpp: Double): DataFrame =
    df.agg(bloomFilterAgg(key, expectedItems, fpp).as("bloom"))

  /** Codegen probe predicate: true iff `key` MIGHT be in the sketch. The
    * sketch frame is attached as a scalar subquery, so it executes once and
    * its binary result is injected into the probe stage — the predicate
    * evaluates inside the scan's whole-stage-codegen span.
    */
  def mightContain(bloom: DataFrame, key: Column): Column =
    Bridge.column(
      BloomFilterMightContain(
        ScalarSubquery(bloom.queryExecution.analyzed),
        hashed(key)))

  /** Exact semi join with a bloom pre-prune: `big` rows are filtered by the
    * sketch BEFORE the shuffle, then the (now small) survivor set goes
    * through a normal exact semi join to strip false positives.
    */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    val keys = small.select(col(keyCol)).distinct()
    val pruned = big.filter(mightContain(bloomFrame(keys, col(keyCol), expectedItems, fpp), col(keyCol)))
    pruned.join(keys, Seq(keyCol), "semi")
  }
}

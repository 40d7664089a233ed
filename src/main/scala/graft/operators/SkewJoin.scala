package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Salted equi-join for skewed keys: when one join key carries a large
  * fraction of the fact rows (the classic hot-study / hot-document key),
  * a plain shuffle join lands that key's entire volume on ONE reducer.
  * Salting splits the hot key's rows across `saltBuckets` reducers by
  * extending the join key with a deterministic fact-side salt and
  * replicating the dimension side once per salt value.
  *
  * This is the manual fallback for the cases AQE's skew-join handling
  * cannot reach (it only splits at shuffle-block granularity and does not
  * apply to all join shapes); the replicated side must be the SMALLER one
  * (replication factor = saltBuckets). Result is row-identical to the
  * plain join — the salt is internal.
  */
object SkewJoin {

  /** Inner equi-join of `fact` (large, skewed) with `dim` (small side,
    * replicated `saltBuckets`×). The salt derives from the fact side's
    * whole row hash over `saltCols` (any columns that spread the hot key's
    * rows — e.g. a line number or payload column), so it is deterministic
    * under retries.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltCols: Seq[String],
      saltBuckets: Int
  ): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(saltBuckets > 1, s"saltBuckets must be > 1: $saltBuckets")
    require(saltCols.nonEmpty, "saltCols must spread the hot key's rows")
    val f = fact.withColumn(
      "_salt", pmod(xxhash64(saltCols.map(col): _*), lit(saltBuckets.toLong)))
    val d = dim.withColumn(
      "_salt", explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    f.join(d, keys :+ "_salt").drop("_salt")
  }
}

package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * Every sampler here derives its randomness from `md5(salt ++ id)` instead
  * of `rand()`. At cluster scale this is the only sound choice: `rand()` is
  * re-drawn when a task retries or a stage is recomputed, so a sampled
  * corpus silently changes under fault recovery, while a hash of the row
  * identity is reproducible across retries, runs, partitionings — and
  * engines, which is what lets DuckDB replay these samples bit-for-bit in
  * the oracle. The Bernoulli/stratified samplers are scan-local (no
  * shuffle, filter pushes to the scan); the per-group sampler pays exactly
  * one shuffle on the group key.
  */
object Sampling {

  /** First 32 hash bits as lowercase hex — uniform on [0, 2^32) in
    * lexicographic string order, identically in any engine with md5.
    */
  def uniformHashHex(id: Column, salt: String = ""): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 8)

  /** `fraction` mapped to the equivalent 8-hex-digit threshold, compared
    * with strict `<` against [[uniformHashHex]]. `fraction >= 1.0` returns
    * the sentinel `"g"` — lexicographically above every hex string — so a
    * full sample keeps ALL rows; clamping to `"ffffffff"` under strict `<`
    * would silently drop rows whose 32-bit hash prefix is exactly
    * 0xffffffff (~2^-32 of rows, a few hundred at 10^12-row scale).
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    if (fraction >= 1.0) "g"
    else f"${(fraction * 4294967296.0).toLong}%08x"
  }

  /** Deterministic Bernoulli sample: keeps a row iff its hash-uniform is
    * below `fraction`. Scan-local; different `salt`s give independent
    * samples (e.g. disjoint train/eval draws).
    */
  def hashSample(df: DataFrame, id: Column, fraction: Double, salt: String = ""): DataFrame =
    if (fraction >= 1.0) df
    else if (fraction <= 0.0) df.filter(lit(false))
    else df.filter(uniformHashHex(id, salt) < lit(hexThreshold(fraction)))

  /** Uniform `k` rows per group — the distributed equivalent of per-group
    * reservoir sampling: rank by `(hash, id)` inside the group and keep the
    * first `k`. One hash-partitioned window, no global sort; the `id`
    * tiebreak makes the draw total even under hash collisions.
    */
  def groupSample(
      df: DataFrame,
      groupCols: Seq[String],
      id: Column,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(uniformHashHex(id, salt), id)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Weighted uniform `k` per group without replacement
    * (Efraimidis–Spirakis A-ES): each row draws `key = u^(1/w)` from its
    * deterministic hash-uniform `u` and the `k` largest keys win — rows
    * with twice the weight are twice as likely to be drawn, exactly, and
    * the draw stays retry-safe/engine-reproducible like every sampler
    * here. Same single window shuffle as [[groupSample]].
    *
    * Rows with non-positive weight never win (key −1).
    */
  def weightedGroupSample(
      df: DataFrame,
      groupCols: Seq[String],
      id: Column,
      weight: Column,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // u in (0,1]: (hash+1)/2^32 avoids u=0 (pow(0, x) would tie at 0)
    val u = (conv(uniformHashHex(id, salt), 16, 10).cast("double") + lit(1.0)) /
      lit(4294967296.0)
    val key = when(weight > 0, pow(u, lit(1.0) / weight)).otherwise(lit(-1.0))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(key.desc, id)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Per-stratum Bernoulli fractions (dataset-mixing rebalance): strata
    * missing from `fractions` fall back to `defaultFraction`. The
    * stratum→threshold table is a broadcast join, never a collect-driven
    * `isin` — the map is user-bounded, the fact side streams.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      id: Column,
      defaultFraction: Double = 0.0,
      salt: String = ""
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = fractions.toSeq
      .map { case (s, f) => (s, hexThreshold(f)) }
      .toDF(strataCol, "_thr")
    df.join(broadcast(thresholds), Seq(strataCol), "left")
      .filter(
        uniformHashHex(id, salt) < coalesce(col("_thr"), lit(hexThreshold(defaultFraction))))
      .drop("_thr")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps

/** Credible-set annotation: flag the tags whose cumulative posterior
  * probability keeps the set under the 95% / 99% threshold
  * (reference: dataset/study_locus.py:963-1016).
  *
  * The cumulative sums use `slice(pp, 1, index - 1)` — the PREVIOUS tags'
  * probabilities — so the variant that crosses the threshold stays in-set
  * (its own probability is needed to satisfy the threshold). Pure HOF chain:
  * per-locus work is O(n²) inside one projection, no shuffle.
  */
object CredibleSets {

  /** Sort each `locus` by descending posteriorProbability and add
    * `is95CredibleSet` / `is99CredibleSet` flags.
    *
    * @param tieBreakField optional secondary ascending sort field making tie
    *   order deterministic (the reference sorts by probability only and is
    *   set-stable on ties)
    */
  def annotateCredibleSets(df: DataFrame, tieBreakField: Option[String] = None): DataFrame = {
    require(df.columns.contains("locus"), "Locus column not available.")
    val nonEmpty = col("locus").isNotNull && size(col("locus")) > 0
    val sorted = tieBreakField match {
      case Some(f) =>
        ArrayOps.orderArrayOfStructsByTwoFields("locus", "posteriorProbability", f)
      case None =>
        ArrayOps.orderArrayOfStructsByField("locus", "posteriorProbability")
    }
    df.withColumn("locus", when(nonEmpty, sorted))
      .withColumn(
        "locus",
        when(
          nonEmpty,
          zip_with(
            col("locus"),
            transform(
              sequence(lit(1), size(col("locus"))),
              index =>
                aggregate(
                  slice(col("locus").getField("posteriorProbability"), lit(1), index - 1),
                  lit(0.0),
                  (acc, el) => acc + el
                )
            ),
            (structE, acc) =>
              structE
                .withField("is95CredibleSet", (acc < 0.95) && acc.isNotNull)
                .withField("is99CredibleSet", (acc < 0.99) && acc.isNotNull)
          )
        )
      )
  }
}

package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** StudyIndex population helpers
  * (reference: dataset/study_index.py:126-230 and
  * assets/data/gwas_population_2_LD_panel_map.json).
  */
object StudyIndexOps {

  /** GWAS ancestry label → LD-panel population label. */
  val PopulationMap: Map[String, String] = Map(
    "European" -> "nfe",
    "African American or Afro-Caribbean" -> "afr",
    "Native American" -> "amr",
    "Asian unspecified" -> "eas",
    "Hispanic or Latin American" -> "amr",
    "East Asian" -> "eas",
    "Central Asian" -> "eas",
    "Oceanian" -> "eas",
    "South East Asian" -> "eas",
    "Other admixed ancestry" -> "nfe",
    "African unspecified" -> "afr",
    "Sub-Saharan African" -> "afr",
    "Greater Middle Eastern (Middle Eastern, North African or Persian)" -> "eas",
    "Aboriginal Australian" -> "eas",
    "Other" -> "nfe",
    "South Asian" -> "eas",
    "NR" -> "nfe",
    "Finnish" -> "fin",
    "African" -> "afr",
    "Admixed American" -> "amr",
    "Icelandic" -> "nfe"
  )

  private val PopulationMapCol = typedlit(PopulationMap)

  /** Map one discoverySamples struct to its LD population
    * (study_index.py:126-152).
    */
  def mapAncestryToLdPopulation(sample: Column): Column =
    struct(
      element_at(PopulationMapCol, sample.getField("ancestry")).as("ancestry"),
      sample.getField("sampleSize").as("sampleSize")
    )

  /** discoverySamples → ldPopulationStructure: LD populations aggregated by
    * summed sample size and expressed as relative shares
    * (study_index.py:182-230). Pure array HOFs — no explode/shuffle.
    */
  def aggregateAndMapAncestries(discoverySamples: Column): Column = {
    val mapped = transform(discoverySamples, s => mapAncestryToLdPopulation(s))
    val pops = array_distinct(transform(mapped, x => x.getField("ancestry")))
    val counts = transform(
      pops,
      p =>
        struct(
          p.as("ldPopulation"),
          aggregate(
            filter(mapped, x => x.getField("ancestry") <=> p),
            lit(0.0),
            (acc, x) => acc + coalesce(x.getField("sampleSize").cast("double"), lit(0.0))
          ).as("sampleSize")
        )
    )
    val total = aggregate(counts, lit(0.0), (acc, x) => acc + x.getField("sampleSize"))
    transform(
      counts,
      x =>
        struct(
          x.getField("ldPopulation").as("ldPopulation"),
          (x.getField("sampleSize") / total).as("relativeSampleSize")
        )
    )
  }
}

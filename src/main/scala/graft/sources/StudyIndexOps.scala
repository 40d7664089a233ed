package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.core.GDataset

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

  // StudyQualityCheck flag texts (study_index.py:44-80)
  val DuplicatedStudyFlag = "The identifier of this study is not unique"
  val UnknownStudyTypeFlag = "This type of study is not supported"
  val UnresolvedDiseaseFlag = "No valid disease identifier found"
  val DeprecatedProjectFlag = "Deprecated project"

  /** Flag non-unique study identifiers (study_index.py:279-296). The
    * reference keeps one arbitrary copy unflagged (`row_number` over
    * `orderBy(rand())`); this port takes an explicit deterministic
    * tiebreak column instead so the flagging is reproducible.
    */
  def validateUniqueStudyId(df: DataFrame, tiebreak: Column): DataFrame =
    df.withColumn(
      "qualityControls",
      GDataset.updateQualityFlag(
        col("qualityControls"),
        row_number().over(Window.partitionBy(col("studyId")).orderBy(tiebreak)) > 1,
        DuplicatedStudyFlag))

  /** Flag deprecated project identifiers (study_index.py:298-324). */
  def validateProjectId(df: DataFrame, deprecatedProjectIds: Seq[String]): DataFrame =
    if (deprecatedProjectIds.isEmpty) df
    else
      df.withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"),
          col("projectId").isin(deprecatedProjectIds: _*),
          DeprecatedProjectFlag))

  /** Flag unsupported study types: anything but `gwas` / `*qtl`
    * (study_index.py:436-459).
    */
  def validateStudyType(df: DataFrame): DataFrame =
    df.withColumn(
      "qualityControls",
      GDataset.updateQualityFlag(
        col("qualityControls"),
        !(col("studyType") === "gwas" || col("studyType").endsWith("qtl")),
        UnknownStudyTypeFlag))

  /** Map source EFO ids to reference disease ids and collect per study
    * (study_index.py:326-361). The disease map is reference-bounded —
    * broadcast it so the explode-join never shuffles the study side.
    */
  def normaliseDisease(
      df: DataFrame,
      sourceDiseaseColumn: String,
      diseaseColumn: String,
      diseaseMap: DataFrame
  ): DataFrame =
    df.filter(size(col(sourceDiseaseColumn)) > 0)
      .select(col("studyId"), explode_outer(col(sourceDiseaseColumn)).as("efo"))
      .join(broadcast(diseaseMap), Seq("efo"), "left")
      .groupBy(col("studyId"))
      .agg(collect_set(col("diseaseId")).as(diseaseColumn))

  /** Validate diseases: normalise foreground + background EFO ids and flag
    * GWAS studies with no resolvable disease (study_index.py:364-434).
    */
  def validateDisease(df: DataFrame, diseaseMap: DataFrame): DataFrame = {
    val fg = normaliseDisease(df, "traitFromSourceMappedIds", "diseaseIds", diseaseMap)
    val bg = normaliseDisease(
      df, "backgroundTraitFromSourceMappedIds", "backgroundDiseaseIds", diseaseMap)
    df.join(fg, Seq("studyId"), "left")
      .join(bg, Seq("studyId"), "left")
      .withColumn(
        "diseaseIds",
        coalesce(col("diseaseIds"), array().cast("array<string>")))
      .withColumn(
        "backgroundDiseaseIds",
        coalesce(col("backgroundDiseaseIds"), array().cast("array<string>")))
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"),
          size(col("diseaseIds")) === 0 && col("studyType") === "gwas",
          UnresolvedDiseaseFlag))
  }

  val SumstatsNotAvailableFlag = "Harmonized summary statistics are not available or empty"
  val FailedMeanBetaFlag = "The mean beta QC check value is not within the expected range"
  val FailedPzFlag = "The PZ QC check values are not within the expected range"
  val FailedGcLambdaFlag = "The GC lambda value is not within the expected range"
  val SmallNSnpsFlag = "The number of SNPs in the study is below the expected threshold"

  /** Join summary-statistics QC results into the study index and flag
    * threshold violations (study_index.py:551-660): the wide QC frame is
    * melted to (QCCheckName, QCCheckValue) structs (float-cast, like the
    * reference), collected per study, and each check is read back out of
    * the array. Missing-sumstats studies get only the availability flag —
    * their null check values never fire the threshold conditions.
    */
  def annotateSumstatsQc(
      studies: DataFrame,
      sumstatsQc: DataFrame,
      thresholdMeanBeta: Double = 0.05,
      thresholdMeanDiffPz: Double = 0.05,
      thresholdSeDiffPz: Double = 0.05,
      thresholdMinGcLambda: Double = 0.7,
      thresholdMaxGcLambda: Double = 2.5,
      thresholdMinNVariants: Long = 2000000L
  ): DataFrame = {
    import graft.functions.{ArrayOps, DfOps}
    val melted = DfOps.convertFromWideToLong(
      sumstatsQc, Seq("studyId"), "QCCheckName", "QCCheckValue")
    val qcDf = melted
      .groupBy(col("studyId"))
      .agg(collect_list(struct(col("QCCheckName"), col("QCCheckValue")))
        .as("sumstatQCValues"))
      .withColumn("hasSumstats", lit(true))
    def qcValue(name: String): Column =
      ArrayOps.filterArrayStruct(
        col("sumstatQCValues"), "QCCheckName", lit(name), "QCCheckValue")
    val base = studies.drop("sumstatQCValues", "hasSumstats")
    base
      .join(qcDf, Seq("studyId"), "left")
      .withColumn("hasSumstats", coalesce(col("hasSumstats"), lit(false)))
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"), !col("hasSumstats"), SumstatsNotAvailableFlag))
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"),
          !(abs(qcValue("mean_beta")) <= thresholdMeanBeta),
          FailedMeanBetaFlag))
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"),
          !(abs(qcValue("mean_diff_pz")) <= thresholdMeanDiffPz &&
            qcValue("se_diff_pz") <= thresholdSeDiffPz),
          FailedPzFlag))
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"),
          !(qcValue("gc_lambda") <= thresholdMaxGcLambda &&
            qcValue("gc_lambda") >= thresholdMinGcLambda),
          FailedGcLambdaFlag))
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          col("qualityControls"),
          qcValue("n_variants") < thresholdMinNVariants,
          SmallNSnpsFlag))
  }

  /** discoverySamples → ldPopulationStructure: LD populations aggregated by
    * summed sample size and expressed as relative shares
    * (study_index.py:182-230). Pure array HOFs — no explode/shuffle.
    */
  def aggregateAndMapAncestries(discoverySamples: Column): Column = {
    // bindOnce discipline (round-8 lesson, BindOnceAuditSpec-enforced): the
    // per-sample ancestry mapping is bound once — the population probe, the
    // per-population sums and the total all read the bound value instead of
    // re-inlining (and re-evaluating) the mapping per element.
    val mappedRaw = transform(discoverySamples, s => mapAncestryToLdPopulation(s))
    graft.functions.ArrayOps.bindOnce("mapped" -> mappedRaw) { g =>
      val m = g("mapped")
      val pops = array_distinct(transform(m, x => x.getField("ancestry")))
      val counts = transform(
        pops,
        p =>
          struct(
            p.as("ldPopulation"),
            aggregate(
              filter(m, x => x.getField("ancestry") <=> p),
              lit(0.0),
              (acc, x) => acc + coalesce(x.getField("sampleSize").cast("double"), lit(0.0))
            ).as("sampleSize")
          )
      )
      graft.functions.ArrayOps.bindOnce(
        "counts" -> counts,
        "total" -> aggregate(counts, lit(0.0), (acc, x) => acc + x.getField("sampleSize"))
      ) { g2 =>
        transform(
          g2("counts"),
          x =>
            struct(
              x.getField("ldPopulation").as("ldPopulation"),
              (x.getField("sampleSize") / g2("total")).as("relativeSampleSize")
            )
        )
      }
    }
  }
}

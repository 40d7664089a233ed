package graft.core

import org.apache.spark.sql.types.{DataType, StructType}

import scala.collection.concurrent.TrieMap

/** Registry of declared dataset schemas, loaded from JSON resource files.
  *
  * The JSON files under `src/main/resources/schemas/` are the engine's data
  * contracts (Spark `StructType` JSON format). Schemas are *declared*, never
  * inferred, for curated datasets (reference: common/schemas.py:43-56).
  */
object SchemaRegistry {

  private val cache = TrieMap.empty[String, StructType]

  /** Load a schema by short name, e.g. `schema("study_locus")`. */
  def apply(name: String): StructType =
    cache.getOrElseUpdate(
      name, {
        val path = s"/schemas/$name.json"
        val in = Option(getClass.getResourceAsStream(path)).getOrElse(
          throw new IllegalArgumentException(s"Unknown schema: $name ($path not on classpath)")
        )
        val json =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        DataType.fromJson(json) match {
          case s: StructType => s
          case other => throw new IllegalArgumentException(s"Schema $name is not a struct: $other")
        }
      }
    )

  /** All schema names shipped with the engine. */
  val names: Seq[String] = Seq(
    "amino_acid_variants", "biosample_index", "colocalisation", "contig_index",
    "intervals", "l2g_feature", "l2g_gold_standard", "l2g_predictions",
    "ld_index", "molecular_complex", "pairwise_ld", "study_index",
    "study_locus", "study_locus_overlap", "summary_statistics",
    "summary_statistics_qc", "target_index", "variant_direction",
    "variant_index", "vep_json_output"
  )
}

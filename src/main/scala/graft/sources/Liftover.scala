package graft.sources

import scala.collection.mutable
import scala.io.Source

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Chain-file coordinate liftover between genome builds
  * (reference: common/genomic_region.py:114-260, which wraps pyliftover; this
  * is a from-scratch chain parser following the public UCSC chain format).
  *
  * The parsed chain blocks are broadcast with the UDF closure — a few MB for
  * real chain files — so conversion is a map-side lookup with no shuffle.
  * Ambiguous positions (covered by more than one chain block) are dropped,
  * matching the reference's filter.
  */
object Liftover {

  /** One aligned block: [srcStart, srcEnd) maps to dstStart on dstChrom;
    * negative-strand targets flip within the destination chromosome.
    */
  final case class Block(
      srcChrom: String, srcStart: Long, srcEnd: Long,
      dstChrom: String, dstStart: Long, dstSize: Long, dstStrandNeg: Boolean)

  final case class ChainMap(blocks: Map[String, Array[Block]]) extends Serializable {
    /** All mappings of a (chrom, 0-based pos); ≥2 results = ambiguous. */
    def convert(chrom: String, pos: Long): Seq[(String, Long)] =
      blocks.getOrElse(chrom, Array.empty).iterator
        .filter(b => pos >= b.srcStart && pos < b.srcEnd)
        .map { b =>
          val off = pos - b.srcStart
          val dst =
            if (b.dstStrandNeg) b.dstSize - (b.dstStart + off) - 1
            else b.dstStart + off
          (b.dstChrom, dst)
        }
        .toSeq
  }

  /** Parse a UCSC chain file (header `chain score tName tSize tStrand tStart
    * tEnd qName qSize qStrand qStart qEnd id`, then `size [dt dq]` block
    * lines).
    */
  def parseChainFile(path: String): ChainMap = {
    val blocks = mutable.Map.empty[String, mutable.ArrayBuffer[Block]]
    val src = Source.fromFile(path)
    try {
      var tChrom = ""; var qChrom = ""; var qSize = 0L
      var tCursor = 0L; var qCursor = 0L; var qNeg = false
      for (line <- src.getLines().map(_.trim) if line.nonEmpty) {
        val parts = line.split("\\s+")
        if (parts(0) == "chain") {
          tChrom = parts(2); tCursor = parts(5).toLong
          qChrom = parts(7); qSize = parts(8).toLong
          qNeg = parts(9) == "-"; qCursor = parts(10).toLong
        } else {
          val size = parts(0).toLong
          if (size > 0) {
            blocks.getOrElseUpdate(tChrom, mutable.ArrayBuffer.empty) +=
              Block(tChrom, tCursor, tCursor + size, qChrom, qCursor, qSize, qNeg)
          }
          if (parts.length >= 3) {
            tCursor += size + parts(1).toLong
            qCursor += size + parts(2).toLong
          }
        }
      }
    } finally src.close()
    ChainMap(blocks.view.mapValues(_.sortBy(_.srcStart).toArray).toMap)
  }

  /** Append lifted (chromosome, position) columns; unmapped or ambiguous
    * positions yield nulls (and are dropped when `filterUnmapped`).
    * Positions are 1-based on both sides (chain arithmetic is 0-based
    * internally).
    */
  def convertCoordinates(
      df: DataFrame,
      chain: ChainMap,
      chromCol: String = "chromosome",
      posCol: String = "position",
      filterUnmapped: Boolean = true
  ): DataFrame = {
    val convert = udf { (chrom: String, pos: Long) =>
      chain.convert(chrom, pos - 1) match {
        case Seq((c, p)) => Some((c, p + 1))
        case _ => None // unmapped or ambiguous
      }
    }
    val out = df
      .withColumn("_lifted", convert(col(chromCol), col(posCol).cast("long")))
      .withColumn("mappedChromosome", col("_lifted._1"))
      .withColumn("mappedPosition", col("_lifted._2"))
      .drop("_lifted")
    if (filterUnmapped) out.filter(col("mappedPosition").isNotNull) else out
  }

  /** Relational liftover: the chain blocks as a DataFrame
    * (srcChrom, srcStart, srcEnd, dstChrom, dstStart, dstSize,
    * dstStrandNeg) instead of a driver-parsed closure. The distinct
    * (chromosome, position) pairs range-join the broadcast block table,
    * positions covered by ≠1 block are dropped as ambiguous, and the
    * mapping joins back onto the input.
    *
    * Same 1-based contract as [[convertCoordinates]]. Chain files are a few
    * MB even for whole genomes, so the broadcast is always safe; the
    * distinct-then-join-back shape means the range join touches each unique
    * position once no matter how many input rows share it, and the whole
    * plan stays in codegen (no UDF).
    */
  def convertCoordinatesRelational(
      df: DataFrame,
      chainBlocks: DataFrame,
      chromCol: String = "chromosome",
      posCol: String = "position",
      filterUnmapped: Boolean = true
  ): DataFrame = {
    val pos0 = col(posCol).cast("long") - 1
    val dst = when(
      col("dstStrandNeg"),
      col("dstSize") - (col("dstStart") + (pos0 - col("srcStart"))) - 1
    ).otherwise(col("dstStart") + (pos0 - col("srcStart")))
    val mapping = df
      .select(col(chromCol), col(posCol))
      .distinct()
      .join(
        broadcast(chainBlocks),
        col(chromCol) === col("srcChrom") &&
          pos0 >= col("srcStart") && pos0 < col("srcEnd"),
        "inner")
      .withColumn("_dstPos", dst + 1)
      .groupBy(col(chromCol), col(posCol))
      .agg(
        count(lit(1)).as("_n"),
        max(col("dstChrom")).as("mappedChromosome"),
        max(col("_dstPos")).as("mappedPosition"))
      .filter(col("_n") === 1)
      .drop("_n")
    df.join(
      mapping,
      Seq(chromCol, posCol),
      if (filterUnmapped) "inner" else "left")
  }
}

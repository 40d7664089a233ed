package graft.tools
import org.apache.spark.sql.functions._
object WinCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GSession.local(8).spark
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"src${i%3}", s"para one\n\npara ${i%50}\n\nend")).toDF("doc_id", "source", "text")
    def has(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      println(s"[wincheck] $name WindowGroupLimit=${p.contains("WindowGroupLimit")}")
    }
    has("paragraphDedup", graft.operators.TextPipeline.paragraphDedup(docs))
    has("groupSample", graft.operators.Sampling.groupSample(docs, Seq("source"), $"doc_id", 5))
    has("weightedGroupSample", graft.operators.Sampling.weightedGroupSample(docs, Seq("source"), $"doc_id", lit(1.0), 5))
    has("cleanCorpus", graft.operators.TextPipeline.cleanCorpus(docs))
    spark.stop()
  }
}

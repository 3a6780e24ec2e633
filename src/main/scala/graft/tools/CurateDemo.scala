package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.CurationPipeline
import graft.sources.Tables
/** Drives the curation pipeline end-to-end on real test data. */
object CurateDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val (curated, report) = CurationPipeline.curate(docs)
    val r = report.head()
    println(s"[curate] funnel: input=${r.getAs[Long]("input_docs")} " +
      s"exact=${r.getAs[Long]("after_exact_dedup")} " +
      s"quality=${r.getAs[Long]("after_quality")} " +
      s"near=${r.getAs[Long]("after_near_dedup")} " +
      s"ws_tokens=${r.getAs[Long]("total_ws_tokens")} " +
      s"bpe_tokens=${r.getAs[Long]("total_bpe_tokens")}")
    curated.show(3)
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
/** Drives GraftExtensions end-to-end: a session built withExtensions must
  * resolve all three custom functions from plain SQL. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f), Seq("a b", "b c"), "v1"),
        (Array(0f, 1f), Array(1f, 0f), Seq("a b"), "v2"))
      .toDF("a", "b", "sh", "v").createOrReplaceTempView("t")
    spark.sql("""SELECT round(cosine_sim(a, b), 2) AS cos,
                        minhash_sig(sh, 2)[0] AS m0 FROM t""").show(false)
    spark.sql("SELECT kmv_distinct(v, 16) AS kmv FROM t").show(false)
    println("[ext] all three functions resolved via SparkSessionExtensions")
    spark.stop()
  }
}

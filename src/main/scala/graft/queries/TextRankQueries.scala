package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TextOps
import graft.sources.Tables

/** Corpus-statistics text ops: TF-IDF term ranking and per-label embedding
  * centroids — the two classic "needs the whole corpus, not just the row"
  * text/vector aggregations a training-data pipeline runs. */
object TextRankQueries {

  // ------------------------------------------------------------------ q38
  /** TF-IDF top-3 terms per document. Corpus stats (document frequency,
    * N) are tiny aggregates broadcast back onto the term-frequency table:
    * two shuffles (tf, df) + one broadcast join — the fact-sized side
    * never re-shuffles for the join. */
  private def q38(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tokens = Tables.spread(docs)
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tokens.distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("raw").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("raw", col("tf") * log(col("n") / col("df")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("doc_id"), col("term"),
        round(col("raw"), 4).as("tfidf"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }
  private val q38Sql =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY 1, 2),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT t.doc_id, t.term, t.tf * ln((SELECT n FROM n) / df.df) AS raw
      |  FROM tf t JOIN df ON t.term = df.term)
      |SELECT doc_id, term, round(raw, 4) AS tfidf,
      |       row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term) AS rn
      |FROM scored
      |QUALIFY rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  // ------------------------------------------------------------------ q39
  /** Per-label embedding centroids as (label, dim, mean): posexplode +
    * two-key aggregate. The long output shape keeps the oracle trivial;
    * `array_agg` the dims back per label when a vector column is needed. */
  private def q39(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(round(avg(col("v").cast("double")), 4).as("c"))
      .orderBy(col("label"), col("dim"))
  }
  private val q39Sql =
    """WITH u AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings)
      |SELECT label, dim, round(avg(v), 4) AS c
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[Decl] = Seq(
    Decl("q38_tfidf_topk", q38, Some(q38Sql)),
    Decl("q39_label_centroids", q39, Some(q39Sql)))
}

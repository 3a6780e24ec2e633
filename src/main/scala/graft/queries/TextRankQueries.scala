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

  // ------------------------------------------------------------------ q40
  /** Canonical normalization + exact dedup on the normalized hash (the
    * curation pipeline's stage 1 — graft.pipeline.CurationPipeline). */
  private def q40(spark: SparkSession, dir: String): DataFrame = {
    graft.pipeline.CurationPipeline.exactDedup(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), md5(TextOps.normalizeText(col("text"))).as("norm_hash"))
      .orderBy(col("doc_id"))
  }
  private val q40Sql =
    """WITH h AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |        ' +', ' ', 'g')) AS norm_hash
      |  FROM documents)
      |SELECT doc_id, norm_hash FROM h
      |QUALIFY row_number() OVER (PARTITION BY norm_hash ORDER BY doc_id) = 1
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q41
  /** describe()-style summary statistics per group (count / mean / sample
    * stddev / min / max). */
  private def q41(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("value")), 2).as("mean_v"),
        round(stddev_samp(col("value")), 2).as("sd_v"),
        round(min(col("value")), 2).as("min_v"),
        round(max(col("value")), 2).as("max_v"))
      .orderBy(col("event_type"))
  }
  private val q41Sql =
    """SELECT event_type, count(*) AS n,
      |       round(avg(value), 2) AS mean_v,
      |       round(stddev_samp(value), 2) AS sd_v,
      |       round(min(value), 2) AS min_v,
      |       round(max(value), 2) AS max_v
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ q44
  /** Deterministic stratified sampling (graft.ops.Sampling): downsample
    * hot classes by a hash-threshold on the row id — reproducible and
    * oracle-matched (same md5-fraction computed in SQL). */
  private def q44(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.Sampling.stratifiedSample(
      Tables.events(spark, dir), col("event_id"), col("event_type"),
      Map("click" -> 0.1, "view" -> 0.25))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("event_type"))
  }
  private val q44Sql = {
    val frac = (0 until 13)
      .map(j => s"(strpos('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1) * POW(16, ${12 - j})")
      .mkString(" + ")
    s"""WITH hashed AS (
       |  SELECT event_type, md5(CAST(event_id AS VARCHAR)) AS h FROM events),
       |kept AS (
       |  SELECT event_type FROM hashed
       |  WHERE (($frac) / POW(16, 13)) <
       |        CASE event_type WHEN 'click' THEN 0.1 WHEN 'view' THEN 0.25 ELSE 1.0 END)
       |SELECT event_type, count(*) AS n_sampled
       |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val all: Seq[Decl] = Seq(
    Decl("q38_tfidf_topk", q38, Some(q38Sql)),
    Decl("q39_label_centroids", q39, Some(q39Sql)),
    Decl("q40_normalize_dedup", q40, Some(q40Sql)),
    Decl("q41_summary_stats", q41, Some(q41Sql)),
    Decl("q44_stratified_sample", q44, Some(q44Sql)))
}

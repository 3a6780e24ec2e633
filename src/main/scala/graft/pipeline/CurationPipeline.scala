package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{EventOps, TextOps}

/** End-to-end training-data curation: the extension operators composed the
  * way a 100 TB corpus job would chain them — each stage a pure
  * `DataFrame => DataFrame`, cheap stages first so expensive ones see
  * fewer rows:
  *
  *   1. normalize + EXACT dedup (md5 of canonical text; one shuffle)
  *   2. quality gate (per-row expressions only)
  *   3. near-dup candidate removal via MinHash+LSH (band shuffle over
  *      survivors only; keeps the lexicographically-first doc per
  *      verified near-dup pair)
  *   4. token accounting for budget reporting
  *
  * Stage outputs keep lineage columns so the report can attribute drops.
  */
object CurationPipeline {

  case class Config(
      shingleN: Int = 2, minhashK: Int = 8, bandR: Int = 2,
      jaccardThreshold: Double = 0.5,
      minWords: Int = 10, maxStopwordRatio: Double = 0.5,
      stopwords: Seq[String] = Seq("the", "a"))

  /** Stage 1: canonical-text exact dedup, first-wins by id. */
  def exactDedup(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val hashed = docs.withColumn("__norm_hash",
      md5(TextOps.normalizeText(col(text))))
    EventOps.dedupFirstWins(hashed, Seq("__norm_hash"), Seq(col(id)))
      .drop("__norm_hash")
  }

  /** Stage 2: quality gate on per-row signals. */
  def qualityGate(docs: DataFrame, cfg: Config, text: String = "text"): DataFrame = {
    val nWords = size(TextOps.words(col(text)))
    val sw = TextOps.stopwordRatio(col(text), cfg.stopwords)
    docs.where(nWords >= cfg.minWords && sw <= cfg.maxStopwordRatio)
  }

  /** Stage 3: MinHash+LSH near-dup removal — drops the higher-id doc of
    * every verified (jaccard >= threshold) candidate pair. The drop-id set
    * (tiny) is materialized eagerly so the big signature cache can be
    * released before returning. */
  def nearDedup(docs: DataFrame, cfg: Config, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val sig = docs
      .select(col(id), TextOps.shingleSet(col(text), cfg.shingleN).as("__sh"))
      .select(col(id) +: col("__sh") +:
        TextOps.minhashFromSet(col("__sh"), cfg.minhashK): _*)
      .persist()
    try {
      val cand = TextOps.lshCandidatePairs(
        TextOps.lshBands(sig, id, cfg.minhashK, cfg.bandR), id)
      val verified = sig.select(col(id).as("doc_a"), col("__sh").as("sa"))
        .join(broadcast(cand), "doc_a")
        .join(sig.select(col(id).as("doc_b"), col("__sh").as("sb")), "doc_b")
        .where(TextOps.jaccardFromSets(col("sa"), col("sb")) >= cfg.jaccardThreshold)
      // materialize the (ids-only, tiny) drop set while sig is cached, so
      // the big signature cache can be released; the anti-join stays
      // distributed — never a driver-side id list
      val drop = verified.select(col("doc_b").as(id)).distinct().persist()
      drop.count()
      docs.join(drop, Seq(id), "left_anti")
    } finally sig.unpersist()
  }

  /** Stage 4: token accounting columns. */
  def withTokenCounts(docs: DataFrame, text: String = "text"): DataFrame =
    docs.withColumn("ws_tokens", size(TextOps.words(col(text))))
      .withColumn("bpe_tokens", TextOps.bpeishTokenCountOf(text))

  /** The full chain + a one-row funnel report (input → exact-deduped →
    * quality-passed → near-deduped, with the surviving token budget).
    * Stage outputs are cached so the funnel counts and the caller's
    * consumption of `curated` evaluate each stage once (not 4-5×); the
    * caches are job-scoped — call `spark.catalog.clearCache()` or
    * unpersist when running many curations in one long session. */
  def curate(docs: DataFrame, cfg: Config = Config()): (DataFrame, DataFrame) = {
    val exact = exactDedup(docs).persist()
    val quality = qualityGate(exact, cfg).persist()
    val near = nearDedup(quality, cfg)
    val curated = withTokenCounts(near).persist()
    val report = docs.agg(count(lit(1)).as("input_docs"))
      .crossJoin(exact.agg(count(lit(1)).as("after_exact_dedup")))
      .crossJoin(quality.agg(count(lit(1)).as("after_quality")))
      .crossJoin(curated.agg(count(lit(1)).as("after_near_dedup"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens")))
    (curated, report)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence + replay for a learned BPE merge table — the missing
  * lifecycle step between the batched trainer (q159) and the encoder
  * (q160), which learn and apply within ONE session: a production
  * tokenizer is trained once, SHIPPED as an artifact, and must encode
  * byte-identically on every future engine generation (a tokenizer
  * drift silently re-tokenizes the whole corpus — worse than a crash).
  *
  * Storage: one small parquet of (round, slot, mt1, mt2, pair_count) —
  * the exact table q159 emits. Replay contract: [[encodeWith]] applies
  * each ROUND's merges as one token-disjoint set-apply
  * ([[TextOps.bpeApplyMergeSet]]), rounds in ascending order — the
  * identical semantics the trainer used, so `encode(learn(c), d)` in
  * generation N equals `encodeWith(read(path), d)` in generation N+1.
  * The cross-generation tripwire is IndexCompatSpec's `bpe` fixture: a
  * committed vocab written by an earlier round's code must encode the
  * fixture corpus to the recorded fingerprints. */
object BpeVocab {

  /** Write the learned merge table. `learned` rows are
    * (round, slot, mt1, mt2, pair_count) — q159's output shape. One
    * tiny artifact: coalesce(1) is deliberate (a 32k-merge production
    * vocab is still < 1 MB; readers want one footer). */
  def write(spark: SparkSession, learned: Seq[(Int, Int, String, String, Long)],
      path: String): Unit = {
    import spark.implicits._
    learned.toDF("round", "slot", "mt1", "mt2", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a merge table back, ordered (round, slot) — the application
    * order. Fails loudly on a missing/foreign table. */
  def read(spark: SparkSession, path: String): Seq[(Int, Int, String, String, Long)] = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val need = Seq("round", "slot", "mt1", "mt2", "pair_count")
    require(need.forall(df.columns.contains),
      s"$path is not a BPE vocab table (need ${need.mkString(", ")})")
    df.select(col("round"), col("slot"), col("mt1"), col("mt2"),
        col("pair_count"))
      .as[(Int, Int, String, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  /** The canonical encode for a learned vocab: per round (ascending),
    * one token-disjoint set-apply over the running token array — the
    * trainer's own application replayed. Pure in-row column expression:
    * the corpus never shuffles to encode. */
  def encodeExpr(tokens: Column,
      learned: Seq[(Int, Int, String, String, Long)]): Column =
    learned.groupBy(_._1).toSeq.sortBy(_._1).foldLeft(tokens) {
      case (toks, (_, rows)) =>
        TextOps.bpeApplyMergeSet(toks,
          rows.sortBy(_._2).map(r => (r._3, r._4)))
    }

  /** Encode `docs(id, text)` under a learned vocab: (id, encoded text).
    * Map-side only. */
  def encodeWith(docs: DataFrame,
      learned: Seq[(Int, Int, String, String, Long)],
      id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id),
      concat_ws(" ", encodeExpr(TextOps.words(col(text)), learned))
        .as(text))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The INPUTS of the cross-generation index-compatibility fixture —
  * shared by [[IndexFixtureGen]] (which built the committed on-disk
  * indexes under `src/test/resources/index_fixture/` and recorded the
  * probe outputs of the round that built them) and [[IndexCompatSpec]]
  * (which re-probes the committed layout with CURRENT code and demands
  * the recorded outputs). Inputs may live in code because they are fed
  * in fresh both times; the committed parquet is the contract. Dup
  * groups use EXACT duplicate texts (the SimHash short-doc lesson). */
object IndexFixtureData {

  /** 12 docs in 4 exact-duplicate groups of 3 (group = doc_id % 4). */
  def baseDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0L until 12L).map(i => (i, groupText(i % 4))).toDF("doc_id", "text")
  }

  /** The probe batch: two new docs, each an exact duplicate of one group. */
  def batchDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((100L, groupText(0)), (101L, groupText(1))).toDF("doc_id", "text")
  }

  def groupText(g: Long): String =
    s"group$g alpha$g beta$g gamma$g delta$g epsilon$g zeta$g eta$g theta$g iota$g"

  /** 18 deterministic 64-dim vectors (PQ geometry: 4 × 16) + 2 probes. */
  def vecOf(i: Long): Seq[Float] =
    (0 until 64).map(d => ((i * 7 + 3 * d) % 13).toFloat / 13f)

  def baseVecs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0L until 18L).map(i => (i, vecOf(i))).toDF("vec_id", "embedding")
  }

  def batchVecs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((100L, vecOf(2L)), (101L, vecOf(5L))).toDF("vec_id", "embedding")
  }

  /** The frozen quantizer/codebooks: the first 16 base vectors. */
  def base16: Seq[Seq[Float]] = (0L until 16L).map(vecOf)

  /** Phrase queries for the positions-era BM25 fixture: one real
    * adjacent bigram per duplicate group plus a wrong-order control
    * (never adjacent — must return nothing). */
  def phraseQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0L, "group0 alpha0"), (1L, "beta1 gamma1"), (2L, "alpha2 group2"))
      .toDF("query_id", "phrase")
  }

  /** The committed BPE merge table (q159's row shape): round 0 merges
    * raw fixture tokens, round 1 merges round-0 PRODUCTS — so the
    * cross-generation replay must chain rounds in order to reproduce
    * the recorded encodes. Merges are token-disjoint within each round
    * (the bpeApplyMergeSet contract). */
  def bpeVocab: Seq[(Int, Int, String, String, Long)] = Seq(
    (0, 0, "group0", "alpha0", 3L),
    (0, 1, "beta0", "gamma0", 3L),
    (0, 2, "group1", "alpha1", 3L),
    (0, 3, "delta1", "epsilon1", 3L),
    (1, 0, "group0_alpha0", "beta0_gamma0", 3L),
    (1, 1, "zeta1", "eta1", 3L))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot generator of the cross-generation index-compatibility
  * fixture: builds each persisted index family from
  * [[IndexFixtureData]]'s inputs, probes it ONCE with the fixed batch,
  * and commits BOTH the index directories and the probe outputs under
  * `src/test/resources/index_fixture/`. Run once per layout era (round
  * 13 wrote the current one); later rounds must NOT re-run it casually
  * — [[IndexCompatSpec]] reading an index written by an EARLIER round's
  * code is the whole point. Re-generate only on a deliberate,
  * documented layout migration.
  *
  *   sbt "Test/runMain graft.IndexFixtureGen"
  *
  * A second argument GENERATES ONE FAMILY ONLY (`lsh`, `simhash`,
  * `ivf`, `pq`, `bpe`, `graph`, `bm25`) — how a NEW family is added to an existing
  * fixture without rewriting the other families' committed directories
  * with current code (which would silently destroy their
  * earlier-era-layout property; r15 added `bpe` this way). */
object IndexFixtureGen {
  def main(args: Array[String]): Unit = {
    val out = new java.io.File(
      if (args.nonEmpty) args(0) else "src/test/resources/index_fixture")
      .getAbsolutePath
    val onlyFamily = if (args.length > 1) Some(args(1)) else None
    def family(name: String)(gen: => Unit): Unit =
      if (onlyFamily.forall(_ == name)) gen
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-fixture-gen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def save(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")

    val docs = IndexFixtureData.baseDocs(spark)
    val vecs = IndexFixtureData.baseVecs(spark)
    val b16 = IndexFixtureData.base16

    family("lsh") {
      graft.ops.LshIndex.buildSized(docs, s"$out/lsh")
      save(graft.ops.LshIndex.probeAndAppend(spark, s"$out/lsh",
        IndexFixtureData.batchDocs(spark), batchId = Some(0L)), "expected_lsh")
    }

    family("simhash") {
      graft.ops.SimHashIndex.build(docs, s"$out/simhash")
      save(graft.ops.SimHashIndex.probeAndAppend(spark, s"$out/simhash",
        IndexFixtureData.batchDocs(spark), batchId = Some(0L)), "expected_simhash")
    }

    family("ivf") {
      graft.ops.IvfIndex.buildCorpus(vecs, s"$out/ivf", b16, files = 2)
      save(graft.ops.IvfIndex.probeAndAppend(spark, s"$out/ivf",
        IndexFixtureData.batchVecs(spark), b16, batchId = Some(0L)), "expected_ivf")
    }

    family("pq") {
      graft.ops.PqIndex.buildCodes(vecs, s"$out/pq", b16, files = 2)
      save(graft.ops.PqIndex.probeAndAppend(spark, s"$out/pq",
        IndexFixtureData.batchVecs(spark), b16, batchId = Some(0L)), "expected_pq")
    }

    family("graph") {
      // r15 added the graph family this way (the `bpe` precedent): the
      // committed adjacency + the recorded insert log pin the beam
      // entry rule, hop order, tie breaks and the reverse-edge cap
      // across layout eras
      graft.ops.GraphIndex.build(vecs, s"$out/graph", k = 4, maxDeg = 8,
        files = 2)
      save(graft.ops.GraphIndex.probeAndAppend(spark, s"$out/graph",
        IndexFixtureData.batchVecs(spark), batchId = Some(0L)), "expected_graph")
    }

    family("bm25") {
      // r16 added the inverted-index family this way: the committed
      // postings layout + the recorded match log pin the term pk
      // partitioning, df/N/avgdl visibility, query distillation and the
      // BM25 tie rules across layout eras
      graft.ops.InvertedIndex.build(docs, s"$out/bm25")
      save(graft.ops.InvertedIndex.probeAndAppend(spark, s"$out/bm25",
        IndexFixtureData.batchDocs(spark), batchId = Some(0L)), "expected_bm25")
    }

    family("bm25v2") {
      // r17's impact-ordered era gets its OWN committed fixture next to
      // the r16 one (which IndexCompatSpec keeps replaying through the
      // legacy-adoption path): postings with the materialized irn rank
      // column, the termdf df sidecar and the stamped meta — so a
      // future layout change must keep BOTH eras replaying
      graft.ops.InvertedIndex.build(docs, s"$out/bm25_v2")
      save(graft.ops.InvertedIndex.probeAndAppend(spark, s"$out/bm25_v2",
        IndexFixtureData.batchDocs(spark), batchId = Some(0L)),
        "expected_bm25_v2")
    }

    family("bm25v3") {
      // r18's positions era gets its OWN committed fixture next to the
      // r16 (legacy) and r17 (impact-ordered) ones: the positions
      // sidecar (term, doc_id, pos, dl) under the same (pk, gen)
      // layout with the stamped `positions` meta flag — the committed
      // index pins the sidecar layout, and the recorded PHRASE probe
      // pins the adjacency-intersect and phrase-BM25 semantics across
      // every future era
      graft.ops.InvertedIndex.build(docs, s"$out/bm25_v3",
        graft.ops.InvertedIndex.Config(positions = true))
      save(graft.ops.InvertedIndex.probeAndAppend(spark, s"$out/bm25_v3",
        IndexFixtureData.batchDocs(spark), batchId = Some(0L)),
        "expected_bm25_v3")
      save(graft.ops.InvertedIndex.phraseProbe(spark, s"$out/bm25_v3",
        IndexFixtureData.phraseQueries(spark)), "expected_bm25_v3_phrase")
    }

    family("bpe") {
      // a vocab whose round-1 merges consume round-0 PRODUCTS, so the
      // committed artifact exercises the round-chained replay, not just
      // one set-apply; counts are the fixture group sizes (3 base docs
      // per group) — informational, the encode never reads them
      graft.ops.BpeVocab.write(spark, IndexFixtureData.bpeVocab, s"$out/bpe_vocab")
      save(graft.ops.BpeVocab.encodeWith(
        IndexFixtureData.batchDocs(spark),
        graft.ops.BpeVocab.read(spark, s"$out/bpe_vocab")), "expected_bpe")
    }

    println(s"[fixture] written to $out" +
      onlyFamily.fold("")(f => s" (family $f only)"))
    spark.stop()
  }
}

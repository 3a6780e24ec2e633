package graft

import org.apache.spark.sql.DataFrame

/** Cross-generation index-compatibility tripwire: the committed fixture
  * under `src/test/resources/index_fixture/` holds each persisted index
  * family AS WRITTEN BY AN EARLIER ROUND'S CODE (round 13 wrote the
  * current era; see [[IndexFixtureGen]]), plus the probe outputs that
  * round recorded. Each test copies the committed index into scratch
  * and re-delivers the SAME batch (a cross-round crash-retry): current
  * code must read the old layout — hive partitions, generation dirs,
  * `_index_meta` adoption — and converge on the recorded rows. Any
  * layout or semantics drift (partition scheme, meta keys, band/hash
  * spelling, tie rules) fails here loudly instead of corrupting a
  * production index on upgrade. */
class IndexCompatSpec extends SparkSpecBase {

  private val fixture = new java.io.File("src/test/resources/index_fixture")
    .getAbsolutePath

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
      ()
    }
  }

  private def rowsOf(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
    df.select(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  private def check(family: String)(
      probe: String => DataFrame): Unit = {
    val tmp = tmpDir(s"compat_$family")
    copyDir(s"$fixture/$family", s"$tmp/idx")
    val got = rowsOf(probe(s"$tmp/idx"))
    val want = rowsOf(spark.read.parquet(s"$fixture/expected_$family"))
    assert(want.nonEmpty, s"$family fixture recorded no probe rows")
    assert(got == want,
      s"$family: current code probing the committed old-round index " +
        s"diverged from its recorded output")
  }

  test("LSH index written by the previous layout era replays identically") {
    check("lsh")(p => graft.ops.LshIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchDocs(spark), batchId = Some(0L)))
  }

  test("SimHash index written by the previous layout era replays identically") {
    check("simhash")(p => graft.ops.SimHashIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchDocs(spark), batchId = Some(0L)))
  }

  test("IVF corpus written by the previous layout era replays identically") {
    check("ivf")(p => graft.ops.IvfIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchVecs(spark), IndexFixtureData.base16,
      batchId = Some(0L)))
  }

  test("PQ code table written by the previous layout era replays identically") {
    check("pq")(p => graft.ops.PqIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchVecs(spark), IndexFixtureData.base16,
      batchId = Some(0L)))
  }

  test("graph index written by the previous layout era replays identically") {
    check("graph")(p => graft.ops.GraphIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchVecs(spark), batchId = Some(0L)))
  }

  test("BM25 inverted index written by the previous layout era replays identically") {
    // the r16 (pre-impact-order) fixture: current code must ADOPT the
    // legacy layout — probe via the window/scan-df fallbacks, append in
    // the legacy schema — and still converge on the recorded rows
    check("bm25")(p => graft.ops.InvertedIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchDocs(spark), batchId = Some(0L)))
  }

  test("BM25 inverted index written by the impact-ordered era replays identically") {
    // the r17 fixture: postings carry the materialized irn rank, df
    // comes from the termdf sidecar — both the layout and the recorded
    // match log must survive every future era
    val fixturePost = s"$fixture/bm25_v2/postings"
    assert(spark.read.parquet(fixturePost).columns.contains("irn"),
      "bm25_v2 fixture must be the impact-ordered era")
    check("bm25_v2")(p => graft.ops.InvertedIndex.probeAndAppend(
      spark, p, IndexFixtureData.batchDocs(spark), batchId = Some(0L)))
  }

  test("positions-era BM25 fixture replays term AND phrase probes identically") {
    val tmp = tmpDir("compat_bm25_v3")
    copyDir(s"$fixture/bm25_v3", s"$tmp/idx")
    assert(new java.io.File(s"$fixture/bm25_v3/positions").exists,
      "bm25_v3 fixture must carry the positions sidecar")
    // term probe: the family contract (retry replaces gen b0, log
    // converges on the recorded rows)
    val got = rowsOf(graft.ops.InvertedIndex.probeAndAppend(spark,
      s"$tmp/idx", IndexFixtureData.batchDocs(spark), batchId = Some(0L)))
    val want = rowsOf(spark.read.parquet(s"$fixture/expected_bm25_v3"))
    assert(want.nonEmpty && got == want,
      "bm25_v3: term probe diverged from the recorded output")
    // phrase probe: the committed positions layout + recorded ranks pin
    // the adjacency intersect and phrase-BM25 semantics across eras
    val gotP = rowsOf(graft.ops.InvertedIndex.phraseProbe(spark,
      s"$tmp/idx", IndexFixtureData.phraseQueries(spark)))
    val wantP = rowsOf(spark.read.parquet(s"$fixture/expected_bm25_v3_phrase"))
    assert(wantP.nonEmpty && gotP == wantP,
      "bm25_v3: phrase probe diverged from the recorded output")
    // the wrong-order control phrase (query 2, reversed word order) must
    // match nothing — adjacency is directional
    import org.apache.spark.sql.functions.col
    assert(spark.read.parquet(s"$fixture/expected_bm25_v3_phrase")
      .where(col("query_id") === 2).count() == 0,
      "reversed-order control phrase must not match")
  }

  test("pre-positions BM25 indexes (both committed eras) reject phrase " +
    "probes loudly and keep term-probing") {
    import spark.implicits._
    Seq("bm25", "bm25_v2").foreach { family =>
      val tmp = tmpDir(s"compat_pos_$family")
      copyDir(s"$fixture/$family", s"$tmp/idx")
      // neither committed era carries the positions sidecar: the probe
      // must fail loudly (never silently return empty), while term
      // probes on the same index keep working (the check() tests above)
      val e = intercept[IllegalStateException] {
        graft.ops.InvertedIndex.phraseProbe(spark, s"$tmp/idx",
          Seq((0L, "alpha beta")).toDF("query_id", "phrase"))
      }
      assert(e.getMessage.contains("positions"),
        s"$family: expected the positions-era rejection, got: ${e.getMessage}")
    }
  }

  test("BPE vocab written by an earlier generation encodes byte-identically") {
    // the tokenizer-drift tripwire (r14 verdict #8): a vocab learned and
    // shipped by generation N must make generation N+1 encode the same
    // corpus to the same bytes — any change to the merge-set apply, the
    // round chaining or the vocab table schema fails here loudly
    val tmp = tmpDir("compat_bpe")
    copyDir(s"$fixture/bpe_vocab", s"$tmp/vocab")
    val learned = graft.ops.BpeVocab.read(spark, s"$tmp/vocab")
    assert(learned.map(_._1).distinct.size > 1,
      "fixture vocab must span multiple rounds to exercise the chain")
    val got = rowsOf(graft.ops.BpeVocab.encodeWith(
      IndexFixtureData.batchDocs(spark), learned))
    val want = rowsOf(spark.read.parquet(s"$fixture/expected_bpe"))
    assert(want.nonEmpty, "bpe fixture recorded no encoded rows")
    assert(got == want,
      "bpe: current code encoding under the committed vocab diverged " +
        "from the recorded encode")
    // and the chain is real: round-1 merges fused round-0 products
    assert(want.exists(_.contains("group0_alpha0_beta0_gamma0")),
      "fixture encode should contain a round-chained merged token")
  }
}

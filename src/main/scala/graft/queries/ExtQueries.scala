package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Caches, EventOps, GraphOps, IvfIndex, Layout, LogReg, LshIndex, TextOps}
import graft.sources.Tables
import graft.pipeline.CurationPipeline
import graft.functions.{BloomMightContain, CosineSimilarity, MinHashSignature, VectorOps}

/** LLM-training-data pipeline operators (BASELINE.json north star; SURVEY.md
  * §2 "north-star extension operators"): dedup (exact / MinHash+LSH /
  * SimHash / n-gram Jaccard / embedding-cosine), similarity search (brute
  * force + LSH-bucketed ANN), text analysis (lang-ID, quality, tokens,
  * fingerprints), multimodal binary columns. Every query is oracle-paired;
  * the MinHash/SimHash SQL is generated from the same (k, bands, bits)
  * parameters the Spark side uses, so the two can't drift.
  */
object ExtQueries {

  private val K = 8        // minhash signature width
  private val R = 2        // minhashes per LSH band -> 4 bands
  private val SHINGLE_N = 2 // word n-gram shingle size
  private val Q84_SAMPLE = 300 // q84 audit sample size — FIXED, not proportional

  /** DuckDB CTEs producing DISTINCT (doc_id, shingle) word n-grams —
    * mirror of TextOps.shingleRows. */
  private def shingleCtes(n: Int, src: String = "documents"): String = {
    val concat = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - ${n - 2}, 1))) AS i FROM words),
       |sh AS (SELECT DISTINCT doc_id, $concat AS shingle FROM idx)""".stripMargin
  }

  private def sigCte(k: Int): String = {
    val mins = (0 until k).map(s => s"min(md5('$s|' || shingle)) AS m$s").mkString(", ")
    s"sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)"
  }

  private def bandCte(k: Int, r: Int): String = {
    val rows = (0 until k / r).map { b =>
      val key = (b * r until (b + 1) * r).map(i => s"m$i").mkString(" || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }
    s"bands AS (${rows.mkString(" UNION ALL ")})"
  }

  /** DuckDB 8-dim sign-bucket expression — mirror of VectorOps.signBucket. */
  private def bucketSql(dims: Int): String =
    (0 until dims)
      .map(i => s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")

  // ------------------------------------------------------------------ q18
  /** Exact text dedup, first-wins by doc_id on md5(text). Duplicates are
    * injected in-query (mirroring the reference's duplicate model,
    * producer.py:162-166) since the corpus has none. */
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    // duplicate injection via explode of per-row offsets: one scan (a
    // UNION of the table with a filtered self would scan twice)
    val all = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        explode(when(pmod(col("doc_id"), lit(10)) === 0,
          array(lit(0L), lit(1000000L))).otherwise(array(lit(0L)))).as("off"))
      .select((col("doc_id") + col("off")).as("doc_id"),
        md5(col("text")).as("text_hash"))
    EventOps.dedupFirstWins(all, Seq("text_hash"), Seq(col("doc_id")))
      .select(col("doc_id"), col("text_hash"))
      .orderBy(col("doc_id"))
  }
  private val q18Sql =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT doc_id, md5(text) AS text_hash FROM all_docs
      |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q19
  /** MinHash signatures (k=8, word-2-gram shingles). Fully map-side: the
    * shingle set and all k minima are computed inside the row — the only
    * exchange in the plan is the output ORDER BY. */
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    // Two stages on purpose: the shingle set materializes into the spread
    // exchange (computed once), and the 8 md5-minima then run from the
    // materialized column, 32-way parallel — otherwise the set expression
    // inlines into every minhash column (8x recompute).
    val withSh = Tables.spread(Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.shingleSet(col("text"), SHINGLE_N).as("sh")))
      .where(size(col("sh")) > 0) // oracle's sig CTE omits shingle-less docs
    val sig = MinHashSignature.minhashSig(spark, col("sh"), K)
    withSh.select(col("doc_id") +:
        (0 until K).map(i => element_at(sig, i + 1).as(s"m$i")): _*)
      .orderBy(col("doc_id"))
  }
  private val q19Sql =
    s"""WITH ${shingleCtes(SHINGLE_N)},
       |${sigCte(K)}
       |SELECT * FROM sig ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q20
  /** MinHash + LSH near-dup pairs: band-bucket candidates (4 bands × r=2),
    * then EXACT jaccard on candidates only, keep >= 0.5. The full
    * shingle×shingle join never happens — only LSH survivors pay it. */
  private def q20(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(spark, dir)

  /** Verified near-dup pairs (doc_a, doc_b, jaccard >= 0.5), localized —
    * the shared front half of q20 (pair listing) and q59 (transitive
    * clustering of the same pairs). */
  private def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    // Materialize (doc_id, shingle_set, signature) ONCE: the band
    // self-join and both jaccard set-lookups are all consumers of this
    // table, and without materialization each plan branch re-derives the
    // md5-heavy signature expressions from the parquet scan (4 scans).
    // persist() makes every branch read the shared InMemoryRelation —
    // the signature table is ~1% the corpus size. At 100 TB the same op
    // writes the signature table to storage once and joins against it
    // (see TextOps scaladoc); in-memory cache is the single-job form.
    val sigArr = MinHashSignature.minhashSig(spark, col("sh"), K)
    val sig = Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id"), TextOps.shingleSet(col("text"), SHINGLE_N).as("sh")))
      .select(col("doc_id") +: col("sh") +:
        (0 until K).map(i => element_at(sigArr, i + 1).as(s"m$i")): _*)
      .persist()
    try {
      val cand = TextOps.lshCandidatePairs(
        TextOps.lshBands(sig, "doc_id", K, R), "doc_id",
        maxBucket = Some(TextOps.DefaultMaxBucket))
      // candidates are rare -> broadcast them back onto the signature table
      // (map-side joins); jaccard is then in-row on the two set arrays
      val withSets = sig.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
        .join(broadcast(cand), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      val j = TextOps.jaccardFromSets(col("sa"), col("sb"))
      val pairs = withSets.where(j >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
      // Materialize the (tiny) verified-pair list so the signature cache
      // is released before returning — a lazily-returned DataFrame would
      // pin the ~1%-of-corpus cache for the session lifetime. Falls back
      // to the still-cached plan only if the pair list is improbably huge.
      Caches.localize(pairs, maxRows = 1 << 20).getOrElse {
        val p = pairs.persist(); p.count(); p
      }
    } finally sig.unpersist()
  }
  /** CTE chain ending in `pairs` = the verified near-dup pairs — shared
    * by q20 (lists them), q59 (clusters them) and q62 (the incremental
    * subset: `candFilter` restricts candidate pairs, e.g. to those with
    * at least one batch-side member). */
  private def pairCtesWith(candFilter: String, src: String = "documents"): String =
    s"""${shingleCtes(SHINGLE_N, src)},
       |${sigCte(K)},
       |${bandCte(K, R)},
       |bsz AS (SELECT band, key FROM bands GROUP BY band, key
       |  HAVING count(*) <= ${TextOps.DefaultMaxBucket}),
       |kept AS (SELECT bands.* FROM bands JOIN bsz USING (band, key)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id$candFilter),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
       |  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
       |              JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (SELECT doc_a, doc_b,
       |    round(CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter), 4) AS jaccard
       |  FROM inter JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
       |  WHERE CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter) >= 0.5)""".stripMargin
  private val pairCtes = pairCtesWith("")
  private val q20Sql =
    s"""WITH $pairCtes
       |SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------------ q59
  /** Near-dup CLUSTERS: connected components over q20's verified pairs
    * (GraphOps.connectedComponents — alternating large-star/small-star),
    * each doc labeled with its component's minimum doc_id, i.e. the
    * canonical survivor a "keep one per duplicate group" pass retains.
    * The oracle computes the same closure with a recursive CTE (viable
    * on the oracle's scale; the Spark side is the O(log n)-round
    * distributed form). */
  private def q59(spark: SparkSession, dir: String): DataFrame = {
    val edges = nearDupPairs(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    GraphOps.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      .orderBy(col("doc_id"))
  }
  private val q59Sql =
    s"""WITH RECURSIVE $pairCtes,
       |bi AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM bi
       |  UNION
       |  SELECT bi.u, reach.v FROM bi JOIN reach ON bi.v = reach.u)
       |SELECT u AS doc_id, min(v) AS cluster_id
       |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q61
  /** The clustered data layout under the oracle, end-to-end: write the
    * events table range-clustered on user_id (`ops.Layout.clusteredWrite`
    * — range shuffle + in-file sort), scan it back through a pushed range
    * predicate (the layout every file/row-group min-max stat now serves,
    * LayoutSpec proves the disjointness), and the roundtrip — including
    * micros timestamps through the parquet writer — must match the plain
    * filtered table. The (small) filtered result is localized so the
    * scratch dir can be deleted before returning. */
  private def q61(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q61_").toString
    // Deleting eagerly is only safe when localize SUCCEEDED (result is a
    // plan-free local relation). The persist() fallback's lineage still
    // reads the scratch parquet — a cache-block eviction would recompute
    // against deleted files — so that path defers deletion to JVM exit.
    var deferCleanup = false
    try {
      Layout.clusteredWrite(
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts")),
        tmp, files = 8, col("user_id"))
      val filtered = spark.read.parquet(tmp)
        .where(col("user_id").between(2L, 9L))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value_r"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .orderBy(col("event_id"))
      Caches.localize(filtered, maxRows = 1 << 22).getOrElse {
        deferCleanup = true
        val p = filtered.persist(); p.count(); p
      }
    } finally {
      // deleteOnExit runs LIFO, so registering each directory before its
      // children deletes children first, directories last.
      def rmNow(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmNow)
        f.delete(); ()
      }
      def rmAtExit(f: java.io.File): Unit = {
        f.deleteOnExit()
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAtExit)
      }
      val root = new java.io.File(tmp)
      if (deferCleanup) rmAtExit(root) else rmNow(root)
    }
  }
  private val q61Sql =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value_r,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      |FROM events WHERE user_id BETWEEN 2 AND 9
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ q63
  /** Multi-column Z-ORDER layout under the oracle: write events z-ordered
    * on (user_id, event_id) — rank-bucketed bit interleaving,
    * Layout.zorderWrite — and scan back through a conjunction of range
    * predicates on BOTH columns, the multi-predicate shape single-column
    * clustering cannot serve (LayoutSpec proves either-column row-group
    * pruning from the written footers; this query proves the roundtrip
    * bit-exact). */
  private def q63(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q63_").toString
    var deferCleanup = false
    try {
      Layout.zorderWrite(
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts")),
        tmp, files = 8, Seq("user_id", "event_id"))
      val filtered = spark.read.parquet(tmp)
        .where(col("user_id").between(2L, 60L) &&
          col("event_id").between(500L, 5000L))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value_r"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
        .orderBy(col("event_id"))
      Caches.localize(filtered, maxRows = 1 << 22).getOrElse {
        deferCleanup = true
        val p = filtered.persist(); p.count(); p
      }
    } finally {
      def rmNow(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmNow)
        f.delete(); ()
      }
      def rmAtExit(f: java.io.File): Unit = {
        f.deleteOnExit()
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAtExit)
      }
      val root = new java.io.File(tmp)
      if (deferCleanup) rmAtExit(root) else rmNow(root)
    }
  }
  private val q63Sql =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value_r,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      |FROM events
      |WHERE user_id BETWEEN 2 AND 60 AND event_id BETWEEN 500 AND 5000
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ q64
  /** The end-to-end curation pipeline under the oracle: exact dedup on
    * normalized text → quality gate (min words + stopword ratio) →
    * MinHash+LSH near-dedup (drop the higher-id doc of every verified
    * pair) → per-doc token accounting. The oracle replays the identical
    * 4-stage chain in SQL — including the LSH pair CTEs over the
    * QUALITY-GATED corpus, not the raw one, because stage order changes
    * which pairs exist (a low-quality doc must not shield its near-dup
    * from removal). The pipeline's own funnel report + cache lifetimes
    * are pinned by CurationPipelineSpec. */
  private def q64(spark: SparkSession, dir: String): DataFrame = {
    val cfg = CurationPipeline.Config()
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val exact = CurationPipeline.exactDedup(docs)
    val quality = CurationPipeline.qualityGate(exact, cfg)
    val (near, cleanup) = CurationPipeline.nearDedupStaged(quality, cfg)
    try {
      val out = CurationPipeline.withTokenCounts(near)
        .select(col("doc_id"), col("ws_tokens"),
          col("bpe_tokens").cast("long").as("bpe_tokens"))
        .orderBy(col("doc_id"))
      Caches.localize(out, maxRows = 1 << 22).getOrElse {
        val p = out.persist(); p.count(); p
      }
    } finally cleanup()
  }
  private val q64Sql = {
    val norm = "regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')"
    val nWords = "len(string_split(text, ' '))"
    val swHits = "len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a'))"
    s"""WITH exact AS (
       |  SELECT doc_id, text FROM documents
       |  QUALIFY row_number() OVER (PARTITION BY md5($norm) ORDER BY doc_id) = 1),
       |qual AS (
       |  SELECT doc_id, text FROM exact
       |  WHERE $nWords >= 10
       |    AND CAST($swHits AS DOUBLE) / $nWords <= 0.5),
       |${pairCtesWith("", "qual")},
       |dropids AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
       |SELECT doc_id,
       |       CAST($nWords AS INT) AS ws_tokens,
       |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
       |FROM qual
       |WHERE doc_id NOT IN (SELECT doc_id FROM dropids)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------ q62
  /** PERSISTED incremental LSH dedup index (ops.LshIndex) end-to-end
    * under the oracle: build the band-clustered index from a base corpus
    * (doc_id % 4 != 0), then probe it with an ingest batch (doc_id % 4
    * == 0) — the probe computes signatures for the BATCH ONLY, reads only
    * index buckets the batch touches, and emits the verified new near-dup
    * pairs (≥1 batch-side member). The oracle recomputes the same pairs
    * from scratch: the subset of q20's full-corpus pairs with a batch
    * member — which is exactly what an incremental run must produce,
    * including full-bucket hot-bucket-cap semantics (a bucket crossing
    * the cap only once the batch lands is dropped on both sides). */
  private def q62(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q62_").toString
    var deferCleanup = false
    try {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val isBatch = pmod(col("doc_id"), lit(4)) === 0
      LshIndex.buildSized(docs.where(!isBatch), tmp)
      val pairs = LshIndex.probeAndAppend(spark, tmp, docs.where(isBatch))
      // probeAndAppend localizes unless the pair list is improbably huge;
      // in that fallback its (cached) plan still reads the scratch index
      // parquet, so deletion must wait for JVM exit (same rule as q61).
      deferCleanup = !pairs.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
      pairs
    } finally {
      def rmNow(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmNow)
        f.delete(); ()
      }
      def rmAtExit(f: java.io.File): Unit = {
        f.deleteOnExit()
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAtExit)
      }
      val root = new java.io.File(tmp)
      if (deferCleanup) rmAtExit(root) else rmNow(root)
    }
  }
  private val q62Sql =
    s"""WITH ${pairCtesWith(" AND (a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)")}
       |SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------------ q92
  /** STREAMING incremental LSH dedup — the PRODUCTION operator
    * (`StreamingPipeline.startNearDupIngest`: foreachBatch →
    * `LshIndex.probeAndAppend` → batch-tagged pair log) put under the
    * oracle end-to-end: documents arrive in 3 micro-batches, each batch
    * probes the index as built from the base corpus PLUS every earlier
    * batch, logs its verified new near-dup pairs, and appends its own
    * signatures for the next batch. Cross-micro-batch stream-vs-stream
    * pairs are found through the index (batch 3 pairs with batch 1
    * without either being re-scanned), so the union of the logged
    * emissions equals the one-shot incremental result — q62's oracle,
    * recomputed from scratch in SQL. Scale shape: per batch the cost is
    * O(batch signatures) + the file-pruned touched-bucket reads
    * (LshIndex Scaladoc); the stream's own state store is EMPTY — the
    * index on storage IS the state, which is what makes the dedup
    * restartable and horizontally scalable. */
  private def q92(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_q92_").toString
    try {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val isStream = pmod(col("doc_id"), lit(4)) === 0
      LshIndex.buildSized(docs.where(!isStream), s"$tmp/idx")
      // The stream feed: batch docs in doc_id order, 3 micro-batches (the
      // harness chunking used by every streaming oracle query).
      val rows = docs.where(isStream).as[(Long, String)].collect().sortBy(_._1)
      val per = math.max(1, math.ceil(rows.length / 3.0).toInt)
      val chunks = rows.grouped(per).toArray
      val mem = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingPipeline.startNearDupIngest(
        mem.toDF().toDF("doc_id", "text"),
        indexPath = s"$tmp/idx", pairsDir = s"$tmp/pairs",
        checkpointDir = s"$tmp/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      try chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      finally q.stop()
      // Pull the (tiny) pair log fully driver-side so no lineage outlives
      // the scratch dir, then hand back a sorted local relation.
      val logged = spark.read.parquet(s"$tmp/pairs")
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      val schema = logged.schema
      spark.createDataFrame(
          java.util.Arrays.asList(logged.collect(): _*), schema)
        .orderBy(col("doc_a"), col("doc_b"))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(tmp)) // result rows are driver-local; safe now
    }
  }

  // ------------------------------------------------------------------ q21
  /** 16-bit SimHash fingerprints over distinct words — fully in-row
    * (distinct word set + 16 vote sums inside the row; the only shuffles
    * are the spread and the output sort). */
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val withWords = Tables.spread(Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(TextOps.words(col("text"))).as("dw")))
    withWords
      .select(col("doc_id"), TextOps.simhash16InRow(col("dw")).as("simhash16"))
      .orderBy(col("doc_id"))
  }
  private val q21Sql = {
    val bits = (0 until 16).map { j =>
      val h = j / 4 + 1; val s = j % 4
      s"CASE WHEN sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(word), $h, 1)) - 1) >> $s) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH dw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |SELECT doc_id, $bits AS simhash16 FROM dw GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------ q22
  /** n-gram Jaccard similarity on adjacent doc pairs (doc_id, doc_id+1) —
    * the windowless exact-jaccard operator; pairs with empty intersection
    * drop out (inner-join semantics, same in the oracle). */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.shingleSet(col("text"), SHINGLE_N).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
    val b = docs.select((col("doc_id") - 1).as("doc_a"),
      col("doc_id").as("doc_b"), col("sh").as("sb"))
    val j = TextOps.jaccardFromSets(col("sa"), col("sb"))
    a.join(b, "doc_a") // one shuffle join on doc id; jaccard in-row
      .where(size(array_intersect(col("sa"), col("sb"))) >= 1) // oracle's inner-join-on-shingle semantics
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
      .orderBy(col("doc_a"))
  }
  private val q22Sql =
    s"""WITH ${shingleCtes(SHINGLE_N)},
       |inter AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
       |  FROM sh sa JOIN sh sb ON sa.doc_id + 1 = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
       |SELECT doc_a, doc_b,
       |       round(CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter), 4) AS jaccard
       |FROM inter JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
       |ORDER BY doc_a""".stripMargin

  // ------------------------------------------------------------------ q23
  /** Brute-force k-NN (k=3) for probe vectors vec_id < 5: broadcast the
    * probes, one map-side pass over the corpus, per-probe top-k window.
    * The scale baseline every ANN variant is judged against. */
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val probes = Tables.embeddings(spark, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    emb.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", CosineSimilarity.cosineSim(spark, col("embedding"), col("probe")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("probe_id"), col("rn"))
  }
  private val q23Sql =
    """WITH probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe
      |  FROM embeddings WHERE vec_id < 5)
      |SELECT probe_id,
      |       row_number() OVER (PARTITION BY probe_id
      |         ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), probe) DESC, vec_id) AS rn,
      |       vec_id AS neighbor_id,
      |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), probe), 4) AS cos_sim
      |FROM embeddings CROSS JOIN probes
      |WHERE vec_id <> probe_id
      |QUALIFY rn <= 3
      |ORDER BY probe_id, rn""".stripMargin

  // ------------------------------------------------------------------ q24
  /** LSH-bucketed ANN: sign-bucket on the first 8 dims (256 buckets), then
    * search only within the probe's bucket. The scale path: the bucket id
    * is a narrow int computed map-side; the candidate join shuffles
    * corpus-size/256 rows per probe instead of corpus-size.
    *
    * Deliberately NOT hot-bucket-capped (unlike the pair ops q20/q30):
    * probe→corpus matching is linear in bucket size — a hot bucket costs
    * at most what brute force (q23) pays for those probes, never
    * quadratic — and dropping the probe's own bucket would return zero
    * neighbors for exactly the probes that have the most candidates. */
  private def q24(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.spread(Tables.embeddings(spark, dir))
      .withColumn("bucket", VectorOps.signBucket(col("embedding"), 8))
    val probes = Tables.embeddings(spark, dir)
      .withColumn("bucket", VectorOps.signBucket(col("embedding"), 8))
      .where(col("vec_id") < 50)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"),
        col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    emb.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", CosineSimilarity.cosineSim(spark, col("embedding"), col("probe")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("probe_id"), col("rn"))
  }
  private val q24Sql =
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, ${bucketSql(8)} AS bucket
       |  FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, e AS probe, bucket FROM b WHERE vec_id < 50)
       |SELECT probe_id,
       |       row_number() OVER (PARTITION BY probe_id
       |         ORDER BY list_cosine_similarity(e, probe) DESC, vec_id) AS rn,
       |       vec_id AS neighbor_id,
       |       round(list_cosine_similarity(e, probe), 4) AS cos_sim
       |FROM b JOIN probes USING (bucket)
       |WHERE vec_id <> probe_id
       |QUALIFY rn <= 3
       |ORDER BY probe_id, rn""".stripMargin

  // ------------------------------------------------------------------ q25
  /** Heuristic language-ID (stopword-marker scoring), aggregated per true
    * lang label — doubles as a confusion summary of the heuristic. */
  private def q25(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("pred", TextOps.langIdHeuristic(col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === "en", 1L).otherwise(0L)).as("n_pred_en"))
      .orderBy(col("lang"))
  }
  private val q25Sql =
    """WITH scored AS (
      |  SELECT lang,
      |    CASE WHEN CAST(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS DOUBLE)
      |              / len(string_split(text, ' ')) >= 0.05
      |         THEN 'en' ELSE 'other' END AS pred
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en
      |FROM scored GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------ q26
  /** Per-document quality scoring: word count, chars-per-word, stopword
    * ratio, and a bounded composite score — all exact-int-derived doubles
    * so the 4-dp rounding is engine-stable. */
  private def q26(spark: SparkSession, dir: String): DataFrame = {
    val w = TextOps.words(col("text"))
    val nWords = size(w)
    val swRatio = TextOps.stopwordRatio(col("text"), Seq("the", "a"))
    val score = least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5 +
      (lit(1.0) - swRatio) * 0.5
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), nWords.as("n_words"),
        round(col("n_chars").cast("double") / nWords, 4).as("chars_per_word"),
        round(swRatio, 4).as("stopword_ratio"),
        round(score, 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }
  private val q26Sql =
    """WITH base AS (
      |  SELECT doc_id, n_chars, len(string_split(text, ' ')) AS n_words,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS DOUBLE)
      |           / len(string_split(text, ' ')) AS sw
      |  FROM documents)
      |SELECT doc_id, n_words,
      |       round(CAST(n_chars AS DOUBLE) / n_words, 4) AS chars_per_word,
      |       round(sw, 4) AS stopword_ratio,
      |       round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5 + (1.0 - sw) * 0.5, 4) AS quality_score
      |FROM base ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q27
  /** Token counting per language: whitespace tokens + BPE-ish regex
    * tokens, aggregated per lang. */
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"),
        size(TextOps.words(col("text"))).as("ws_tokens"),
        TextOps.bpeishTokenCountOf("text").as("bpe_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"))
      .orderBy(col("lang"))
  }
  private val q27Sql =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
      |       CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpe_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------ q28
  /** Rolling-hash fingerprint: min-md5 over char 8-grams, computed fully
    * within the row (array_min ∘ transform — no explode, no shuffle). */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        TextOps.charFingerprint(col("text"), 8).as("fingerprint"))
      .orderBy(col("doc_id"))
  }
  private val q28Sql =
    """SELECT doc_id,
      |       list_aggregate(list_transform(range(1, greatest(length(text) - 6, 1)),
      |         i -> md5(substr(text, i, 8))), 'min') AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q29
  /** Multimodal column plumbing: text bytes stand in for image/audio
    * payloads as an opaque BINARY column; "decode" is the clearly-marked
    * deterministic stub (graft.multimodal.Multimodal has the
    * mapPartitions-batched variant). Schema/partitioning/lineage are real. */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal.StubCodec._
    val blob = col("text").cast("binary")
    val nBytes = length(blob)
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), lit(FakeMime).as("mime"),
        nBytes.as("n_bytes"),
        (lit(BaseDim) + pmod(nBytes, lit(WidthMod))).as("width"),
        (lit(BaseDim) + pmod(col("doc_id") * HeightMul, lit(HeightMod))).as("height"),
        (lit(1) + pmod(nBytes, lit(FrameMod))).as("n_frames"))
      .orderBy(col("doc_id"))
  }
  private val q29Sql =
    """SELECT doc_id, 'image/fake' AS mime,
      |       octet_length(encode(text)) AS n_bytes,
      |       64 + octet_length(encode(text)) % 576 AS width,
      |       64 + (doc_id * 37) % 416 AS height,
      |       1 + octet_length(encode(text)) % 29 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q91
  /** REAL image decode round-trip: render each document a genuine PNG
    * (javax.imageio encode) whose pixel dimensions derive from table
    * columns, ship the compressed bytes as the opaque BINARY media
    * column, and run the production decode path
    * ([[graft.multimodal.Multimodal.decodeBatched]] → ImageIoCodec) to
    * read the dimensions back off the bytes. The oracle recomputes the
    * dimension formulas relationally — the hash can only match if the
    * engine actually parsed the PNG format (q29's stub spelling could
    * not know the width without decoding). Scale shape: encode and
    * decode are two narrow mapPartitions stages — blobs never cross a
    * shuffle; only the (doc_id, dims) result is sorted for the oracle. */
  private def q91(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val w = 8 + (docId % 24).toInt
        val h = 4 + (nChars % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0 // deterministic one-row fill; pixel content is not the contract
        while (x < w) { img.setRGB(x, 0, (x * 2654435761L & 0xffffff).toInt); x += 1 }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Multimodal.MediaRecord(docId, out.toByteArray, "image/png")
      })
    Multimodal.decodeBatched(spark, media.toDF()).toDF()
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("doc_id"))
  }
  private val q91Sql =
    """SELECT doc_id, 'image/png' AS mime,
      |       8 + doc_id % 24 AS width,
      |       4 + n_chars % 16 AS height,
      |       1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q95
  /** REAL audio decode round-trip — q91's contract for the audio
    * modality: render each document a genuine WAVE file
    * (javax.sound.sampled encode) whose sample rate / channel count /
    * duration derive from table columns, ship the bytes as the opaque
    * BINARY media column, and run the production decode path
    * ([[graft.multimodal.Multimodal.decodeAudioBatched]] → SoundCodec)
    * to read them back off the RIFF headers. The oracle recomputes the
    * parameter formulas relationally — the hash only matches if the
    * engine actually parsed the format. Durations are chosen to divide
    * the sample rate exactly, so frames·1000/rate is integer-exact on
    * both sides. Same scale shape as q91: two narrow mapPartitions
    * stages, blobs never cross a shuffle. */
  private def q95(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (docId, nChars) =>
        val rate = if (docId % 2 == 0) 8000 else 16000
        val channels = 1 + (docId % 2).toInt
        val dMs = 100 + (nChars % 400).toInt
        val ns = rate / 1000 * dMs
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val pcm = new Array[Byte](ns * 2 * channels) // silence; content is
        val out = new java.io.ByteArrayOutputStream() // not the contract
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Multimodal.MediaRecord(docId, out.toByteArray, "audio/wav")
      })
    Multimodal.decodeAudioBatched(spark, media.toDF()).toDF()
      .select(col("doc_id"), col("mime"), col("sample_rate"), col("channels"),
        col("n_samples"), col("duration_ms"))
      .orderBy(col("doc_id"))
  }
  private val q95Sql =
    """SELECT doc_id, 'audio/wav' AS mime,
      |  CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  (CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END) * (100 + n_chars % 400)
      |    AS n_samples,
      |  100 + n_chars % 400 AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q30
  /** Embedding-cosine near-dup: top-20 same-bucket pairs by cosine (the
    * corpus has no >0.5-cosine pairs, so a threshold would return empty;
    * top-k keeps the op observable at every scale factor). */
  private def q30(spark: SparkSession, dir: String): DataFrame = {
    // hot-bucket cap: within-bucket pairing is quadratic in bucket size,
    // so a degenerate bucket (e.g. all-zero embeddings) is dropped rather
    // than paid — mirrored in the oracle SQL below.
    val emb = TextOps.capHotBuckets(
      Tables.embeddings(spark, dir)
        .withColumn("bucket", VectorOps.signBucket(col("embedding"), 8)),
      Seq("bucket"), TextOps.DefaultMaxBucket, "ann_hot_buckets")
    val a = emb.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(CosineSimilarity.cosineSim(spark, col("ea"), col("eb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(20)
  }
  private val q30Sql =
    s"""WITH b0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, ${bucketSql(8)} AS bucket
       |  FROM embeddings),
       |sz AS (SELECT bucket FROM b0 GROUP BY bucket HAVING count(*) <= ${TextOps.DefaultMaxBucket}),
       |b AS (SELECT b0.* FROM b0 JOIN sz USING (bucket))
       |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       |       round(list_cosine_similarity(a.e, c.e), 4) AS cos_sim
       |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |ORDER BY cos_sim DESC, vec_a, vec_b
       |LIMIT 20""".stripMargin

  // ------------------------------------------------------------------ q54
  /** IVF ANN — the OTHER scale path next to q24's LSH buckets: a coarse
    * quantizer of 16 deterministic centroids (the first 16 corpus
    * vectors; production trains k-means, same plumbing) partitions the
    * corpus into cells, and each probe searches only its `nprobe=2`
    * nearest cells.
    *
    * The IVF scale property is that centroids always fit on the driver:
    * they ship as ONE literal array inside the assignment expression, so
    * corpus→cell assignment is a pure map-side pass (zero shuffle, full
    * codegen via the fused cosine), and the candidate join carries
    * ~nprobe/K of the corpus per probe. Deterministic end to end —
    * argmax ties break toward the higher centroid id in BOTH engines —
    * so unlike typical ANN this variant is exactly oracle-checkable. */
  private def q54(spark: SparkSession, dir: String): DataFrame = {
    val K = 16
    val cents: Seq[Seq[Float]] = Tables.embeddings(spark, dir)
      .where(col("vec_id") < K).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    ivfAnn(spark, dir, cents)
  }

  /** Production spelling of q54: centroids come from a PERSISTED table
    * (ops/IvfIndex — one clusteredWrite at train time, one bounded
    * read-back per query) instead of being re-derived from the corpus
    * inside every query. Same plan after the centroids are in hand —
    * IvfIndexSpec pins result-equality with the declared q54. */
  def annIvfPersisted(spark: SparkSession, dir: String,
      centroidPath: String): DataFrame =
    ivfAnn(spark, dir, graft.ops.IvfIndex.loadCentroids(spark, centroidPath))

  /** The IVF candidate frame (probe_id, vec_id, cos): corpus rows in the
    * probe's NPROBE nearest cells only — the frame both q54's top-k and
    * q87's recall audit rank. */
  private def ivfCandidates(spark: SparkSession, dir: String,
      cents: Seq[Seq[Float]]): DataFrame = {
    val K = cents.size; val NPROBE = 2
    val centArr = typedLit(cents)
    // array of (cos-to-centroid, centroid_id) structs; array_max /
    // descending sort order = (cos, id) lexicographic = ties to higher id
    def cellScores(v: Column): Column =
      transform(sequence(lit(1), lit(K)), i => struct(
        CosineSimilarity.cosineSim(spark, v, element_at(centArr, i)).as("c"),
        (i - 1).as("i")))
    def cellOf(v: Column): Column = array_max(cellScores(v)).getField("i")
    def topCells(v: Column): Column =
      transform(slice(reverse(array_sort(cellScores(v))), 1, NPROBE),
        s => s.getField("i"))
    val emb = Tables.spread(Tables.embeddings(spark, dir))
      .withColumn("cell", cellOf(col("embedding")))
    val probes = Tables.embeddings(spark, dir)
      .where(col("vec_id") >= K && col("vec_id") < K + 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"),
        topCells(col("embedding")).as("pcells"))
    emb.crossJoin(broadcast(probes))
      .where(array_contains(col("pcells"), col("cell")) &&
        col("vec_id") =!= col("probe_id"))
      .withColumn("cos", CosineSimilarity.cosineSim(spark, col("embedding"), col("probe")))
      .select(col("probe_id"), col("vec_id"), col("cos"))
  }

  private def topNeighbors(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  private def ivfAnn(spark: SparkSession, dir: String,
      cents: Seq[Seq[Float]]): DataFrame =
    topNeighbors(ivfCandidates(spark, dir, cents), 3)
      .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("probe_id"), col("rn"))
  private val q54Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16),
      |asg AS (
      |  SELECT vec_id,
      |    (SELECT c_id FROM c ORDER BY list_cosine_similarity(v, cv) DESC, c_id DESC
      |     LIMIT 1) AS cell
      |  FROM e),
      |p AS (SELECT vec_id AS probe_id, v AS pv FROM e
      |      WHERE vec_id >= 16 AND vec_id < 21),
      |pc AS (
      |  SELECT probe_id, c_id, row_number() OVER (PARTITION BY probe_id
      |    ORDER BY list_cosine_similarity(pv, cv) DESC, c_id DESC) AS rn
      |  FROM p CROSS JOIN c),
      |cand AS (
      |  SELECT p.probe_id, e.vec_id, list_cosine_similarity(p.pv, e.v) AS cos
      |  FROM p JOIN pc ON pc.probe_id = p.probe_id AND pc.rn <= 2
      |       JOIN asg a ON a.cell = pc.c_id
      |       JOIN e ON e.vec_id = a.vec_id
      |  WHERE e.vec_id <> p.probe_id)
      |SELECT probe_id,
      |       row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn,
      |       vec_id AS neighbor_id, round(cos, 4) AS cos_sim
      |FROM cand
      |QUALIFY rn <= 3
      |ORDER BY probe_id, rn""".stripMargin

  // ------------------------------------------------------------------ q97
  /** INCREMENTAL IVF ingest — the vector twin of q62's incremental LSH
    * index: the corpus is PERSISTED cell-clustered under a FROZEN coarse
    * quantizer (the first 16 base vectors, q54's deterministic
    * convention trained on the base generation only), an ingest batch
    * (vec_id % 4 == 0) is assigned to cells map-side under the SAME
    * centroid literals and APPENDED — cell-local, no rebuild, no
    * reshuffle of the existing table — and the ANN probe then runs
    * against the persisted table only. The oracle recomputes the same
    * top-3 from scratch over the full corpus with base-derived
    * centroids: an incremental ingest that drifted the quantizer,
    * mis-assigned a cell, or lost batch rows hash-mismatches. Scale
    * shape: the frozen-quantizer append IS the IVF production contract
    * (FAISS-style add-after-train); each append range-partitions only
    * its own batch, and the clustered layout keeps per-file cell ranges
    * prunable across generations (Layout.clusteredWrite append mode). */
  private def q97(spark: SparkSession, dir: String): DataFrame = {
    val K = 16; val NPROBE = 2
    val tmp = java.nio.file.Files.createTempDirectory("graft_q97_").toString
    try {
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val isBatch = pmod(col("vec_id"), lit(4)) === 0
      val cents: Seq[Seq[Float]] = emb.where(!isBatch)
        .orderBy(col("vec_id")).limit(K)
        .select(col("embedding")).collect().map(_.getSeq[Float](0).toSeq).toSeq
      val centArr = typedLit(cents)
      def cellScores(v: Column): Column =
        transform(sequence(lit(1), lit(K)), i => struct(
          CosineSimilarity.cosineSim(spark, v, element_at(centArr, i)).as("c"),
          (i - 1).as("i")))
      def cellOf(v: Column): Column = array_max(cellScores(v)).getField("i")
      def topCells(v: Column): Column =
        transform(slice(reverse(array_sort(cellScores(v))), 1, NPROBE),
          s => s.getField("i"))
      val path = s"$tmp/corpus"
      // build: base generation, cell-clustered
      Layout.clusteredWrite(
        Tables.spread(emb.where(!isBatch))
          .withColumn("cell", cellOf(col("embedding"))),
        path, files = 4, col("cell"))
      // ingest: batch under the SAME frozen centroids, appended
      Layout.clusteredWrite(
        Tables.spread(emb.where(isBatch))
          .withColumn("cell", cellOf(col("embedding"))),
        path, files = 2, "append", col("cell"))
      // probe: persisted table only — the original frames never re-read
      val corpus = spark.read.parquet(path)
      val probes = corpus.where(col("vec_id") >= K && col("vec_id") < K + 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe"),
          topCells(col("embedding")).as("pcells"))
      val cand = corpus.crossJoin(broadcast(probes))
        .where(array_contains(col("pcells"), col("cell")) &&
          col("vec_id") =!= col("probe_id"))
        .withColumn("cos",
          CosineSimilarity.cosineSim(spark, col("embedding"), col("probe")))
        .select(col("probe_id"), col("vec_id"), col("cos"))
      val out = topNeighbors(cand, 3)
        .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 4).as("cos_sim"))
        .orderBy(col("probe_id"), col("rn"))
      // Fallback is localCheckpoint, NOT persist: the finally below deletes
      // the scratch parquet this plan reads, and a persisted frame can be
      // evicted/recomputed after cleanup — a checkpoint severs the lineage.
      Caches.localize(out, maxRows = 1 << 16)
        .getOrElse(out.localCheckpoint())
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(tmp)) // result is localized (15 rows); safe now
    }
  }
  private val q97Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS c_id, v AS cv FROM (
      |        SELECT * FROM e WHERE vec_id % 4 <> 0 ORDER BY vec_id LIMIT 16)),
      |asg AS (
      |  SELECT vec_id,
      |    (SELECT c_id FROM c ORDER BY list_cosine_similarity(v, cv) DESC, c_id DESC
      |     LIMIT 1) AS cell
      |  FROM e),
      |p AS (SELECT vec_id AS probe_id, v AS pv FROM e
      |      WHERE vec_id >= 16 AND vec_id < 21),
      |pc AS (
      |  SELECT probe_id, c_id, row_number() OVER (PARTITION BY probe_id
      |    ORDER BY list_cosine_similarity(pv, cv) DESC, c_id DESC) AS rn
      |  FROM p CROSS JOIN c),
      |cand AS (
      |  SELECT p.probe_id, e.vec_id, list_cosine_similarity(p.pv, e.v) AS cos
      |  FROM p JOIN pc ON pc.probe_id = p.probe_id AND pc.rn <= 2
      |       JOIN asg a ON a.cell = pc.c_id
      |       JOIN e ON e.vec_id = a.vec_id
      |  WHERE e.vec_id <> p.probe_id)
      |SELECT probe_id,
      |       row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn,
      |       vec_id AS neighbor_id, round(cos, 4) AS cos_sim
      |FROM cand
      |QUALIFY rn <= 3
      |ORDER BY probe_id, rn""".stripMargin

  // ------------------------------------------------------------------ q51
  /** Incremental dedup against a seen corpus via a Bloom pre-filter —
    * the "is this document new?" pattern every continuously-ingesting
    * training-data pipeline runs. The probe side is the WHOLE incoming
    * feed (which, as in real re-ingestion, contains already-seen docs:
    * here the 20% with doc_id % 5 == 0 that form the seen corpus); key =
    * md5 of normalized text.
    *
    * The Bloom filter (built in ONE distributed pass over the corpus,
    * `stat.bloomFilter`) splits the probe side map-side:
    *   - might_contain = false → DEFINITELY new, no join at all (at a
    *     3% fpp that is ~97% of the truly-new majority of the feed);
    *   - might_contain = true → seen-or-false-positive, verified by an
    *     anti-join against the corpus keys.
    * The result is EXACT (the bloom only prunes the join input), which is
    * why the oracle is the plain NOT IN — and at 100 TB the anti-join
    * shuffles only the seen fraction + 3% of the new instead of the whole
    * feed. */
  private def q51(spark: SparkSession, dir: String): DataFrame = {
    val key = md5(TextOps.normalizeText(col("text")))
    val docs = Tables.documents(spark, dir)
    val corpusKeys = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select(key.as("k"))
    val probe = Tables.spread(docs)
      .select(col("doc_id"), col("lang"), col("n_chars"), key.as("k"))
    val bloom = corpusKeys.stat.bloomFilter("k", 100000L, 0.03)
    val might = BloomMightContain.mightContain(spark, bloom, col("k"))
    probe.where(!might)
      .unionByName(probe.where(might).join(corpusKeys, Seq("k"), "left_anti"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }
  private val q51Sql =
    """WITH k AS (
      |  SELECT doc_id, lang, n_chars,
      |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |        ' +', ' ', 'g')) AS k
      |  FROM documents)
      |SELECT doc_id, lang, n_chars FROM k
      |WHERE k NOT IN (SELECT k FROM k WHERE doc_id % 5 = 0)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q58
  /** Document chunking: split every document into 40-token windows with a
    * 30-token stride (10-token overlap) — the op every training-data
    * pipeline runs between curation and tokenization. All in-row: the
    * token array and the window starts are computed inside the row and
    * posexploded, so the only wide ops are the spread and the output
    * sort; chunk rows inherit the document's partitioning. */
  private def q58(spark: SparkSession, dir: String): DataFrame = {
    val CHUNK = 40; val STRIDE = 30
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.words(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(STRIDE))))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        array_join(slice(col("toks"), col("col") + 1, lit(CHUNK)), " ").as("chunk"),
        least(lit(CHUNK), size(col("toks")) - col("col")).as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }
  private val q58Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), 30)) AS st
      |      FROM t)
      |SELECT doc_id, CAST(st // 30 AS INT) AS chunk_id,
      |       array_to_string(list_slice(toks, st + 1, st + 40), ' ') AS chunk,
      |       CAST(least(40, len(toks) - st) AS INT) AS n_tokens
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  // ------------------------------------------------------------------ q55
  /** Full EP1 wire-format roundtrip under the oracle: events → Kinesis
    * envelope encode → the producer's `{"Records": [...]}` batch wrapper
    * WITH its 5%-of-batches / 1-10-duplicates model (producer.py:142-167)
    * → batch explode → base64/JSON decode → first-wins dedup. The output
    * must equal the original table exactly — one query exercising the
    * whole wire chain (json+base64 both ways, the batch dict, the
    * batch-shaped duplicate distribution, schema-bound decode) against a
    * trivial oracle. All narrow maps except the one batch groupBy and the
    * dedup shuffle. */
  private def q55(spark: SparkSession, dir: String): DataFrame = {
    val BATCH = 100
    val wireSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
    val packed = Tables.events(spark, dir).select(
      (col("event_id") / BATCH).cast("long").as("batch_id"), col("event_id"),
      EventOps.encodeEnvelope(struct(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us")), col("event_id").cast("string")).as("record"))
    val batches = packed.groupBy(col("batch_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("record")))).as("rs"))
      .select(col("batch_id"), transform(col("rs"), r => r.getField("record")).as("records"))
    val withDups = batches.withColumn("records",
        when(pmod(xxhash64(col("batch_id"), lit(101)), lit(100)) < 5,
          concat(col("records"), slice(col("records"), lit(1),
            (pmod(xxhash64(col("batch_id"), lit(103)), lit(10)) + 1).cast("int"))))
          .otherwise(col("records")))
      .select(to_json(struct(col("records").as("Records"))).as("batch"))
    val decoded = EventOps.explodeRecordsBatch(withDups)
      .select(EventOps.decodeEnvelope(col("record"), wireSchema).as("e"))
      .select(col("e.*"))
    EventOps.dedupFirstWins(decoded, Seq("event_id"), Seq(col("ts_us")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value_r"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
      .orderBy(col("event_id"))
  }
  private val q55Sql =
    """SELECT event_id, user_id, event_type, round(value, 2) AS value_r,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ q65
  /** Persisted-quantizer IVF ANN — q54's production spelling end-to-end
    * under the oracle: train (= the same deterministic first-16 stand-in
    * q54 uses), persist via one IvfIndex.writeCentroids, read back, and
    * query. Result ≡ q54 by construction (IvfIndexSpec pins it too), so
    * the oracle IS q54's SQL. The centroid read-back localizes eagerly,
    * so the scratch dir can be deleted before the result is consumed. */
  private def q65(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q65_").toString
    try {
      graft.ops.IvfIndex.writeCentroids(
        Tables.embeddings(spark, dir).where(col("vec_id") < 16)
          .select(col("vec_id").as("centroid_id"), col("embedding")),
        tmp)
      annIvfPersisted(spark, dir, tmp)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  // ------------------------------------------------------------------ q66
  /** Int8 quantization audit, oracle-checked: per-vector scale and worst
    * reconstruction error. err(x) = |x − round(x/scale)·scale| is
    * derivable from x alone, so DuckDB verifies the DEFINITIONAL scale/2
    * bound on every vector — the quantizer's exactness contract runs
    * under the hash compare, not just a spec. Map-side only + sort. */
  private def q66(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        VectorOps.quantizeInt8(col("embedding")).as("q"))
    val scale = col("q").getField("scale")
    val maxErr = aggregate(
      transform(col("embedding"), x => {
        val xd = x.cast("double")
        abs(xd - round(xd / scale) * scale)
      }),
      lit(0.0), (acc, e) => greatest(acc, e))
    emb.select(col("vec_id"),
        round(scale, 6).as("scale_r"),
        round(maxErr, 6).as("max_err_r"),
        (maxErr <= scale / 2 + lit(1e-9)).as("within_bound"))
      .orderBy(col("vec_id"))
  }
  private val q66Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (
      |  SELECT vec_id, v,
      |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
      |              ELSE list_max(list_transform(v, x -> abs(x))) / 127 END AS scale
      |  FROM e),
      |m AS (
      |  SELECT vec_id, scale,
      |         list_max(list_transform(v, x -> abs(x - round(x / scale) * scale))) AS max_err
      |  FROM s)
      |SELECT vec_id, round(scale, 6) AS scale_r, round(max_err, 6) AS max_err_r,
      |       max_err <= scale / 2 + 1e-9 AS within_bound
      |FROM m ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------------ q67
  /** PII redaction (TextOps.redactPii) over documents with
    * deterministically fabricated PII (the corpus itself has none):
    * doc_id % 3 == 0 gains an email, % 5 == 0 a phone, % 15 both. Output
    * carries the full redacted text — the hash compare certifies every
    * byte of the replace chain, in both engines' regex dialects. */
  private def q67(spark: SparkSession, dir: String): DataFrame = {
    val withPii = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" contact u"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" call +1 555 01"),
              pmod(col("doc_id"), lit(100)).cast("string"))).otherwise(lit("")))
          .as("text"))
    withPii.select(col("doc_id"),
        TextOps.redactPii(col("text")).as("redacted"))
      .withColumn("had_email", col("redacted").contains("[EMAIL]"))
      .withColumn("had_phone", col("redacted").contains("[PHONE]"))
      .orderBy(col("doc_id"))
  }
  private val q67Sql =
    """WITH withpii AS (
      |  SELECT doc_id,
      |         text ||
      |         CASE WHEN doc_id % 3 = 0
      |              THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
      |              ELSE '' END ||
      |         CASE WHEN doc_id % 5 = 0
      |              THEN ' call +1 555 01' || CAST(doc_id % 100 AS VARCHAR)
      |              ELSE '' END AS text
      |  FROM documents),
      |red AS (
      |  SELECT doc_id,
      |         regexp_replace(regexp_replace(text,
      |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |           '\+?[0-9][0-9() .-]{6,}[0-9]', '[PHONE]', 'g') AS redacted
      |  FROM withpii)
      |SELECT doc_id, redacted,
      |       contains(redacted, '[EMAIL]') AS had_email,
      |       contains(redacted, '[PHONE]') AS had_phone
      |FROM red ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q68
  /** Sequence packing: assign documents to fixed token-budget bins
    * (CAP = 512 whitespace tokens) by running token count, per lang
    * shard in doc_id order — the packing pass a training pipeline runs
    * per shard before writing examples. The window partitions by lang:
    * per-shard state, horizontally scalable — a single global ordering
    * would serialize the whole corpus through one partition at 100 TB.
    * Contiguous fill (bin = tokens-before-this-doc ÷ CAP) keeps the
    * assignment a pure window expression — deterministic and
    * oracle-expressible, unlike iterative first-fit. */
  private def q68(spark: SparkSession, dir: String): DataFrame = {
    val CAP = 512
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"), col("doc_id"),
        size(TextOps.words(col("text"))).as("tokens"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("bin",
        floor((sum(col("tokens")).over(w) - col("tokens")) / lit(CAP.toDouble)))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"))
      .orderBy(col("lang"), col("bin"))
  }
  private val q68Sql =
    """WITH toks AS (
      |  SELECT lang, doc_id, len(string_split(text, ' ')) AS tokens
      |  FROM documents),
      |binned AS (
      |  SELECT lang, doc_id, tokens,
      |         CAST(floor((sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
      |           / 512.0) AS BIGINT) AS bin
      |  FROM toks)
      |SELECT lang, bin, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
      |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ q69
  /** Benchmark-contamination detection: which training documents share
    * ≥ 30% of an eval-set document's word trigrams? The eval set is
    * doc_id % 10 == 0, plus one FABRICATED exact leak per eval doc
    * (doc_id + 1,000,000, same text) so the operator's positive path is
    * deterministic at every scale factor — mirroring q67's fabricated-PII
    * pattern. Scale shape: the eval set is the small side by definition
    * (benchmarks are MBs against a 100 TB corpus), so its exploded
    * trigrams BROADCAST to both the overlap join and the per-benchmark
    * totals join — the corpus side never shuffles for the match; the
    * only wide exchange is the per-pair overlap count, whose input is
    * already filtered to matching trigrams. */
  private def q69(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val leaked = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val tri = Tables.spread(docs.unionByName(leaked))
      .select(col("doc_id"), explode(TextOps.shingleSet(col("text"), 3)).as("sh"))
    val isBench = pmod(col("doc_id"), lit(10)) === 0 && col("doc_id") < 1000000L
    val bench = tri.where(isBench).select(col("doc_id").as("bench_id"), col("sh"))
    val train = tri.where(!isBench).select(col("doc_id").as("train_id"), col("sh"))
    val benchSize = bench.groupBy(col("bench_id")).agg(count(lit(1)).as("n_sh"))
    train.join(broadcast(bench), "sh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(benchSize), "bench_id")
      .where(col("overlap").cast("double") / col("n_sh") >= 0.3)
      .select(col("train_id"), col("bench_id"), col("overlap"),
        round(col("overlap").cast("double") / col("n_sh"), 4).as("frac"))
      .orderBy(col("train_id"), col("bench_id"))
  }
  private val q69Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
      |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
      |idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM w),
      |tri AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM idx),
      |bench AS (SELECT doc_id AS bench_id, sh FROM tri
      |          WHERE doc_id % 10 = 0 AND doc_id < 1000000),
      |train AS (SELECT doc_id AS train_id, sh FROM tri
      |          WHERE NOT (doc_id % 10 = 0 AND doc_id < 1000000)),
      |bc AS (SELECT bench_id, count(*) AS n_sh FROM bench GROUP BY 1),
      |ov AS (SELECT train_id, bench_id, count(*) AS overlap
      |       FROM train JOIN bench USING (sh) GROUP BY 1, 2)
      |SELECT train_id, bench_id, overlap,
      |       round(CAST(overlap AS DOUBLE) / n_sh, 4) AS frac
      |FROM ov JOIN bc USING (bench_id)
      |WHERE CAST(overlap AS DOUBLE) / n_sh >= 0.3
      |ORDER BY train_id, bench_id""".stripMargin

  // ------------------------------------------------------------------ q70
  /** Repetition-ratio quality signal: 1 − distinct/total word bigrams —
    * high values flag boilerplate/spam (the "repeated n-gram" filter
    * every corpus-quality pipeline runs). Fully in-row: the bigram LIST
    * (non-distinct, unlike shingleSet) and its distinct size are derived
    * inside the row; no explode, no shuffle beyond the output sort. */
  private def q70(spark: SparkSession, dir: String): DataFrame = {
    val w = TextOps.words(col("text"))
    val grams = transform(sequence(lit(1), size(w) - 1),
      i => concat_ws(" ", slice(w, i, lit(2))))
    Tables.spread(Tables.documents(spark, dir))
      .where(size(w) >= 2)
      .select(col("doc_id"), size(grams).as("total_bigrams"),
        size(array_distinct(grams)).as("uniq_bigrams"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("uniq_bigrams").cast("double") / col("total_bigrams"), 4))
      .orderBy(col("doc_id"))
  }
  private val q70Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |         len(w) - 1 AS total_bigrams,
      |         len(list_distinct(list_transform(range(1, len(w)),
      |           i -> w[i] || ' ' || w[i+1]))) AS uniq_bigrams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 2)
      |SELECT doc_id, CAST(total_bigrams AS INT) AS total_bigrams,
      |       CAST(uniq_bigrams AS INT) AS uniq_bigrams,
      |       round(1.0 - CAST(uniq_bigrams AS DOUBLE) / total_bigrams, 4) AS rep_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q71
  /** Deterministic shard assignment — the reproducible "shuffle" step
    * before writing training shards: shard = first two hex chars of
    * md5(doc_id), i.e. a 256-way content-independent hash split both
    * engines compute identically (md5 is the cross-engine hash the repo
    * already standardizes on; production swaps xxhash64 at half the
    * cost). Pure map-side assignment + one aggregation; the per-shard
    * counts/token totals are the shard-balance audit a pipeline runs
    * before training. */
  private def q71(spark: SparkSession, dir: String): DataFrame = {
    Tables.spread(Tables.documents(spark, dir))
      .select(
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2).as("shard"),
        size(TextOps.words(col("text"))).as("tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("shard_tokens"))
      .orderBy(col("shard"))
  }
  private val q71Sql =
    """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
      |       count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS shard_tokens
      |FROM documents
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------ q72
  /** Extended curation pipeline — the round-9 operators composed into the
    * full training-data chain a 100 TB corpus job runs, each stage the
    * CurationPipeline function, under a stage-order-sensitive oracle:
    *
    *   fabricate PII (the "raw corpus") → exact dedup → quality gate →
    *   repetition gate → PII scrub → MinHash+LSH near-dedup (over the
    *   SCRUBBED text — redaction markers participate in similarity) →
    *   token accounting → per-lang sequence packing.
    *
    * Output: every surviving doc with its token count and packed bin.
    * The oracle replays the identical 8 stages in SQL; any stage
    * reordering or threshold drift flips the hash. */
  private def q72(spark: SparkSession, dir: String): DataFrame = {
    val cfg = CurationPipeline.Config()
    val withPii = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" contact u"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" call +1 555 01"),
              pmod(col("doc_id"), lit(100)).cast("string"))).otherwise(lit("")))
          .as("text"))
    val exact = CurationPipeline.exactDedup(withPii)
    val quality = CurationPipeline.qualityGate(exact, cfg)
    val rep = CurationPipeline.repetitionGate(quality, maxRepetition = 0.2)
    val red = CurationPipeline.piiScrub(rep)
    val (near, cleanup) = CurationPipeline.nearDedupStaged(red, cfg)
    try {
      val toks = near.withColumn("ws_tokens", size(TextOps.words(col("text"))))
      val out = CurationPipeline
        .packed(toks, col("lang"), col("doc_id"), col("ws_tokens"))
        .select(col("doc_id"), col("lang"), col("ws_tokens"), col("bin"))
        .orderBy(col("doc_id"))
      Caches.localize(out, maxRows = 1 << 22).getOrElse {
        val p = out.persist(); p.count(); p
      }
    } finally cleanup()
  }
  private val q72Sql = {
    val norm = "regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')"
    val nWords = "len(string_split(text, ' '))"
    val swHits = "len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a'))"
    val uniqBigrams = "len(list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
      "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])))"
    s"""WITH pii AS (
       |  SELECT doc_id, lang,
       |         text ||
       |         CASE WHEN doc_id % 3 = 0
       |              THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
       |              ELSE '' END ||
       |         CASE WHEN doc_id % 5 = 0
       |              THEN ' call +1 555 01' || CAST(doc_id % 100 AS VARCHAR)
       |              ELSE '' END AS text
       |  FROM documents),
       |exact AS (
       |  SELECT doc_id, lang, text FROM pii
       |  QUALIFY row_number() OVER (PARTITION BY md5($norm) ORDER BY doc_id) = 1),
       |qual AS (
       |  SELECT doc_id, lang, text FROM exact
       |  WHERE $nWords >= 10
       |    AND CAST($swHits AS DOUBLE) / $nWords <= 0.5),
       |rep AS (
       |  SELECT doc_id, lang, text FROM qual
       |  WHERE 1.0 - CAST($uniqBigrams AS DOUBLE) / ($nWords - 1) <= 0.2),
       |red AS (
       |  SELECT doc_id, lang,
       |         regexp_replace(regexp_replace(text,
       |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
       |           '\\+?[0-9][0-9() .-]{6,}[0-9]', '[PHONE]', 'g') AS text
       |  FROM rep),
       |${pairCtesWith("", "red")},
       |dropids AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
       |survivors AS (
       |  SELECT doc_id, lang, text FROM red
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dropids)),
       |toks AS (SELECT doc_id, lang, $nWords AS ws_tokens FROM survivors),
       |binned AS (
       |  SELECT doc_id, lang, ws_tokens,
       |         CAST(floor((sum(ws_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ws_tokens)
       |           / 512.0) AS BIGINT) AS bin
       |  FROM toks)
       |SELECT doc_id, lang, CAST(ws_tokens AS INT) AS ws_tokens, bin
       |FROM binned ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------ q73
  /** Exact duplicated-span detection via mod-p k-gram fingerprinting —
    * the "exact substring dedup" complement to MinHash doc-level near-dup
    * (MinHash dilutes a copied paragraph inside an otherwise-new doc;
    * span fingerprints catch it). Classic scheme (the mod-p baseline of
    * Schleimer et al.'s winnowing, SIGMOD'03): hash every k=8-word gram,
    * KEEP only hashes whose last hex digit ∈ {0,4,8,c} (density 1/4) —
    * selection is content-defined, so two docs sharing an exact span
    * select the SAME fingerprints regardless of alignment. Fabricated
    * positives (doc_id%7==0 → a 25-word verbatim excerpt re-published as
    * doc_id+2,000,000) keep the match path deterministic at every sf.
    * Scale shape: gram hashing + selection + dedup are fully in-row
    * (one explode, no shuffle until the fingerprint join); only the
    * 1-in-4 selected 16-byte hashes ever shuffle — the corpus text does
    * not. A boilerplate cap (fingerprints present in > 64 docs are
    * dropped, the q20 hot-bucket idiom) bounds the self-join fanout at
    * 100 TB, where a site-wide footer gram would otherwise pair
    * quadratically. */
  private def q73(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val w0 = TextOps.words(col("text"))
    val excerpts = docs
      .where(pmod(col("doc_id"), lit(7)) === 0 && size(w0) >= 27)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ", slice(w0, 3, 25)).as("text"))
    val w = TextOps.words(col("text"))
    val gramHashes = transform(sequence(lit(1), size(w) - 7),
      i => md5(concat_ws(" ", slice(w, i, lit(8))).cast("binary")))
    val fps = Tables.spread(docs.unionByName(excerpts))
      .where(size(w) >= 8)
      .select(col("doc_id"),
        explode(array_distinct(filter(gramHashes,
          h => substring(h, 32, 1).isin("0", "4", "8", "c")))).as("fp"))
    val common = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs")).where(col("n_docs") > 64)
    val rare = fps.join(broadcast(common), Seq("fp"), "left_anti")
    rare.as("a").join(rare.as("b"), Seq("fp"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }
  private val q73Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, array_to_string(string_split(text, ' ')[3:27], ' ')
      |  FROM documents
      |  WHERE doc_id % 7 = 0 AND len(string_split(text, ' ')) >= 27),
      |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      |      WHERE len(string_split(text, ' ')) >= 8),
      |fp AS (
      |  SELECT DISTINCT doc_id, unnest(
      |    list_filter(
      |      list_transform(range(1, len(w) - 6),
      |        i -> md5(array_to_string(w[i:i+7], ' '))),
      |      h -> substr(h, 32, 1) IN ('0','4','8','c'))) AS fp
      |  FROM w),
      |rare AS (
      |  SELECT doc_id, fp FROM fp
      |  QUALIFY count(*) OVER (PARTITION BY fp) <= 64)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
      |FROM rare a JOIN rare b USING (fp)
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2
      |HAVING count(*) >= 2
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------------ q74
  /** Domain-temperature mixture sampling — the data-mixing step of every
    * corpus build: resample languages so the mix follows c^α (α=0.5,
    * target 60% of the corpus) instead of raw counts, up-weighting tail
    * languages exactly as multilingual-LM recipes do. The per-doc
    * keep/drop decision is DETERMINISTIC: doc u-value = first 6 hex
    * chars of md5(doc_id), kept iff u ≤ the per-lang rate threshold
    * rendered as 6-digit hex — both engines compare the same strings, so
    * the sample is reproducible and oracle-checkable (no rand()).
    * Scale shape: per-lang counts are a tiny agg (one row per language)
    * joined back by BROADCAST; the keep test is then pure map-side —
    * a 100 TB corpus is sampled in one scan with the only wide exchange
    * being the few-hundred-row audit aggregation. Rates are rounded to
    * 9 dp before thresholding so both engines floor identical doubles. */
  private def q74(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(col("n_docs")).as("n_tot"), sum(sqrt(col("n_docs"))).as("w_tot"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate",
        round(least(lit(1.0),
          col("n_tot") * lit(0.6) * sqrt(col("n_docs")) /
            (col("w_tot") * col("n_docs"))), 9))
      .select(col("lang"), col("n_docs"), col("rate"))
    val kept = docs.join(broadcast(rates), "lang")
      .where(col("rate") >= 1.0 ||
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 6) <=
          format_string("%06x", floor(col("rate") * 16777215d).cast("int")))
    kept.groupBy(col("lang"), col("n_docs"), col("rate"))
      .agg(count(lit(1)).as("n_kept"))
      .select(col("lang"), col("n_docs"), col("n_kept"), col("rate"))
      .orderBy(col("lang"))
  }
  private val q74Sql =
    """WITH counts AS (
      |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT sum(n_docs) AS n_tot, sum(sqrt(n_docs)) AS w_tot FROM counts),
      |rates AS (
      |  SELECT lang, n_docs,
      |         round(least(1.0, n_tot * 0.6 * sqrt(n_docs) / (w_tot * n_docs)), 9) AS rate
      |  FROM counts, tot),
      |kept AS (
      |  SELECT d.lang, r.n_docs, r.rate
      |  FROM documents d JOIN rates r USING (lang)
      |  WHERE r.rate >= 1.0
      |     OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) <=
      |        printf('%06x', CAST(floor(r.rate * 16777215) AS INT)))
      |SELECT lang, n_docs, count(*) AS n_kept, rate
      |FROM kept GROUP BY lang, n_docs, rate
      |ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------ q75
  /** Corpus version delta — the incremental-ingest diff a versioned 100 TB
    * corpus runs between snapshots: which docs were added, removed, or
    * changed. Old snapshot is fabricated deterministically from the
    * table (docs with id%10==0 absent → "added"; id%13==0 re-published
    * under id+3,000,000 → "removed"; id%7==0 carried a 'draft: ' prefix
    * → "changed"). Scale shape: each side reduces to (doc_id, md5(text))
    * MAP-SIDE, so only 16-byte content hashes ever cross the wire — the
    * full-outer join on doc_id shuffles hashes, never text; on the
    * bucketed-by-id layout (sources/Bucketing) the join is zero-Exchange.
    * Unchanged docs (the overwhelming majority between real snapshots)
    * are filtered before the output sort. */
  private def q75(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val vOld = Tables.spread(
      docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit("draft: "), col("text"))).otherwise(col("text")).as("text"))
        .unionByName(docs.where(pmod(col("doc_id"), lit(13)) === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h_old"))
    val vNew = Tables.spread(docs)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h_new"))
    vOld.join(vNew, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }
  private val q75Sql =
    """WITH v_old AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 7 = 0 THEN 'draft: ' || text ELSE text END) AS h_old
      |  FROM documents WHERE doc_id % 10 != 0
      |  UNION ALL
      |  SELECT doc_id + 3000000, md5(text) FROM documents WHERE doc_id % 13 = 0),
      |v_new AS (SELECT doc_id, md5(text) AS h_new FROM documents),
      |delta AS (
      |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |         CASE WHEN o.h_old IS NULL THEN 'added'
      |              WHEN n.h_new IS NULL THEN 'removed'
      |              WHEN o.h_old != n.h_new THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM v_old o FULL OUTER JOIN v_new n ON o.doc_id = n.doc_id)
      |SELECT doc_id, status FROM delta
      |WHERE status != 'unchanged'
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q76
  /** Corpus-derived unigram LM quality scoring — the perplexity-filter
    * stage of CCNet-style corpus builds (Wenzek et al., arXiv:1911.00359):
    * score each doc by the mean unigram surprisal of its tokens under the
    * corpus's OWN term distribution, then gate each doc against its
    * language's mean score (head = ≥0.01 ln-units better than the lang
    * mean, tail = ≥0.01 worse, middle between). CCNet ships absolute
    * per-lang cutoffs, not global terciles — deliberately mirrored here
    * because cutoffs need NO global sort/rank: after two tiny broadcast
    * joins the bucketing is a pure map-side compare at any corpus size.
    *
    * `surprisal` is mean −ln(cnt(term)) — the corpus-size ln(N) constant
    * is dropped so no 1-row scalar frame has to join the plan (the bucket
    * compare is translation-invariant). Scale shape: the LM is one
    * (term, cnt) aggregate (vocab-bounded; web-scale practice prunes to
    * top-N + OOV backoff before broadcast), the per-lang means are a
    * second few-row aggregate, both joined back BROADCAST; the corpus
    * never shuffles. Both engines round score and cutoffs to 4 dp before
    * comparing so identical doubles gate both sides. */
  private def q76(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.words(col("text"))).as("term"))
    val lm = tokens.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val scored = tokens.join(broadcast(lm), "term")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"), (-avg(log(col("cnt")))).as("s"))
    val langMeans = scored.groupBy(col("lang")).agg(avg(col("s")).as("mean_s"))
    val sR = round(col("s"), 4)
    scored.join(broadcast(langMeans), "lang")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        sR.as("surprisal"),
        when(sR <= round(col("mean_s") - 0.01, 4), lit("head"))
          .when(sR >= round(col("mean_s") + 0.01, 4), lit("tail"))
          .otherwise(lit("middle")).as("bucket"))
      .orderBy(col("doc_id"))
  }
  private val q76Sql =
    """WITH tokens AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |lm AS (SELECT term, count(*) AS cnt FROM tokens GROUP BY 1),
      |s AS (SELECT doc_id, lang, count(*) AS n_tokens, -avg(ln(cnt)) AS s
      |      FROM tokens t JOIN lm USING (term) GROUP BY 1, 2),
      |m AS (SELECT lang, avg(s) AS mean_s FROM s GROUP BY 1)
      |SELECT s.doc_id, s.lang, s.n_tokens, round(s.s, 4) AS surprisal,
      |       CASE WHEN round(s.s, 4) <= round(m.mean_s - 0.01, 4) THEN 'head'
      |            WHEN round(s.s, 4) >= round(m.mean_s + 0.01, 4) THEN 'tail'
      |            ELSE 'middle' END AS bucket
      |FROM s JOIN m USING (lang)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q77
  /** SemDeDup — semantic dedup inside IVF cells (Abbas et al.,
    * arXiv:2303.09540): embeddings are assigned to their nearest coarse
    * centroid (q54's literal-centroid map-side pass — zero shuffle for
    * the assignment), and only WITHIN a cell are pairs compared; a doc is
    * a semantic duplicate if some lower-id doc in its cell has cosine
    * ≥ 0.35. Survivorship is deterministic min-id-wins on direct pairs
    * (transitive-closure clustering is q59's operator; SemDeDup proper
    * also prunes on direct ε-balls only). Output = the dropped docs with
    * their earliest keeper.
    *
    * Scale shape: the O(n²) risk lives entirely inside cells, which is
    * the point of the IVF partition — production sizes K ~ √n so cells
    * stay bounded, and the same hot-bucket cap as the LSH ops drops
    * degenerate cells (mirrored in the oracle) instead of paying them.
    * Cell assignment is codegen'd map-side; the pair join shuffles on
    * cell id only. */
  private def q77(spark: SparkSession, dir: String): DataFrame = {
    val K = 16
    val cents: Seq[Seq[Float]] = Tables.embeddings(spark, dir)
      .where(col("vec_id") < K).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val centArr = typedLit(cents)
    // nearest centroid, ties to the higher id — exactly q54's rule
    def cellOf(v: Column): Column =
      array_max(transform(sequence(lit(1), lit(K)), i => struct(
        CosineSimilarity.cosineSim(spark, v, element_at(centArr, i)).as("c"),
        (i - 1).as("i")))).getField("i")
    val asg = TextOps.capHotBuckets(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
          cellOf(col("embedding")).as("cell")),
      Seq("cell"), 4 * TextOps.DefaultMaxBucket, "semdedup_hot_cells")
    val a = asg.select(col("cell"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = asg.select(col("cell"), col("vec_id").as("vb"), col("embedding").as("eb"))
    val cos = CosineSimilarity.cosineSim(spark, col("ea"), col("eb"))
    val pairs = a.join(b, Seq("cell"))
      .where(col("va") < col("vb") && cos >= 0.35)
      .select(col("cell"), col("va"), col("vb"), round(cos, 4).as("cos_sim"))
    val firstKeeper = Window.partitionBy(col("vb")).orderBy(col("va"))
    pairs.withColumn("rn", row_number().over(firstKeeper))
      .where(col("rn") === 1)
      .select(col("vb").as("vec_id"), col("va").as("dup_of"),
        col("cell"), col("cos_sim"))
      .orderBy(col("vec_id"))
  }
  private val q77Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16),
      |asg0 AS (
      |  SELECT vec_id, v,
      |    (SELECT c_id FROM c ORDER BY list_cosine_similarity(v, cv) DESC, c_id DESC
      |     LIMIT 1) AS cell
      |  FROM e),
      |sz AS (SELECT cell FROM asg0 GROUP BY cell HAVING count(*) <= 256),
      |asg AS (SELECT asg0.* FROM asg0 JOIN sz USING (cell)),
      |pairs AS (
      |  SELECT a.cell, a.vec_id AS va, b.vec_id AS vb,
      |         list_cosine_similarity(a.v, b.v) AS cos
      |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35)
      |SELECT vb AS vec_id, va AS dup_of, cell, round(cos, 4) AS cos_sim
      |FROM pairs
      |QUALIFY row_number() OVER (PARTITION BY vb ORDER BY va) = 1
      |ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------------ q78
  /** Vocabulary coverage / OOV-rate audit — the tokenizer-fit check run
    * before training: build the top-16 vocabulary by global term count
    * (ties break lexicographically) and report each doc's out-of-vocab
    * token rate. Scale shape: the vocab is a TakeOrderedAndProject over
    * the (term, cnt) aggregate — top-k never materializes the full
    * ranked vocab on one node — and joins back BROADCAST (a real
    * tokenizer vocab is ≤ a few hundred k entries); the corpus-side pass
    * is then map-side. Production swaps the exact count agg for the
    * Space-Saving sketch (q60) when the raw term cardinality itself is
    * the bottleneck; the exact spelling is declared so the oracle stays
    * sharp. */
  private def q78(spark: SparkSession, dir: String): DataFrame = {
    val V = 16
    val tokens = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
    val vocab = tokens.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(V)
      .select(col("term"), lit(1).as("in_vocab"))
    tokens.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov") / col("n_tokens"), 4).as("oov_rate"))
      .orderBy(col("doc_id"))
  }
  private val q78Sql =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnts AS (SELECT term, count(*) AS cnt FROM tokens GROUP BY 1),
      |vocab AS (SELECT term FROM cnts ORDER BY cnt DESC, term LIMIT 16)
      |SELECT t.doc_id, count(*) AS n_tokens,
      |       count(*) FILTER (WHERE v.term IS NULL) AS n_oov,
      |       round(count(*) FILTER (WHERE v.term IS NULL) * 1.0 / count(*), 4)
      |         AS oov_rate
      |FROM tokens t LEFT JOIN vocab v ON t.term = v.term
      |GROUP BY t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ------------------------------------------------------------------ q79
  /** Signed random projection of embeddings to 8 dims — the
    * Johnson-Lindenstrauss / Achlioptas ±1 projection ("Database-friendly
    * random projections", PODS'01) every large-corpus pipeline uses to
    * cheapen downstream similarity work: distances survive within (1±ε)
    * at a fraction of the width. The projection matrix is never stored
    * or broadcast as data: sign s(i,j) ∈ {+1,−1} is a pure function of
    * (i,j) — first hex nibble of md5(i||'|'||j) < '8' — so any engine,
    * any executor, any scale regenerates the identical matrix from the
    * formula. Since it is ROW-INVARIANT it is rendered ONCE at
    * plan-build time into a literal (64×8 doubles), leaving the per-row
    * work a pure fused multiply-add over the array — no per-row hashing
    * (the first spelling md5'd in-row: 512 digests/row, ~6× slower).
    * Map-side only (one scan, no shuffle before the output sort); long
    * (vec_id, dim, v) shape keeps the oracle trivial, array_agg per
    * vec_id when a vector column is needed. */
  private def q79(spark: SparkSession, dir: String): DataFrame = {
    val D = 8; val SRC_DIM = 64 // embeddings.parquet is fixed 64-wide
    def signOf(i: Int, j: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$j".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
    // signs(j) = the ±1 column for output dim j, indexable by i (1-based)
    val signs = typedLit(Seq.tabulate(D)(j => Seq.tabulate(SRC_DIM)(i => signOf(i, j))))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(D - 1))).as("dim"))
      .select(col("vec_id"), col("dim"),
        round(aggregate(
          transform(sequence(lit(1), size(col("embedding"))), i =>
            element_at(col("embedding"), i).cast("double") *
              element_at(element_at(signs, col("dim") + 1), i)),
          lit(0.0d), (acc, x) => acc + x), 4).as("v"))
      .orderBy(col("vec_id"), col("dim"))
  }
  private val q79Sql =
    """WITH u AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |dims AS (SELECT unnest(range(0, 8)) AS dim),
      |terms AS (
      |  SELECT vec_id, dim,
      |         x * (CASE WHEN substr(md5((i - 1) || '|' || dim), 1, 1)
      |                        BETWEEN '0' AND '7'
      |                   THEN 1.0 ELSE -1.0 END) AS t
      |  FROM u CROSS JOIN dims)
      |SELECT vec_id, dim, round(sum(t), 4) AS v
      |FROM terms GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ q80
  /** Model-based quality scoring via the hashing trick — the classifier
    * stage of DCLM / FineWeb-Edu-style pipelines (a linear model over
    * hashed token features), with the weights a documented deterministic
    * stand-in (same convention as the multimodal stub codec): w(term) =
    * 2·h/0xffffff − 1 ∈ [−1,1] where h = first 6 md5 hex digits, exactly
    * reproducible in both engines. The Spark-side plumbing is the real
    * thing and is the point: hashed features mean the "model" needs NO
    * vocabulary table, NO broadcast, NO join — scoring is one in-row
    * pass (margin = mean token weight, score = sigmoid(4·margin), keep
    * at margin ≥ 0), so a 100 TB corpus is classifier-filtered in a
    * single map-side scan. Swapping trained fasttext weights in means
    * replacing the md5 expression with a weight lookup — the plan shape
    * (map-only, shuffle-free until the output sort) is unchanged. */
  private def q80(spark: SparkSession, dir: String): DataFrame = {
    val w = (t: Column) =>
      conv(substring(md5(t.cast("binary")), 1, 6), 16, 10).cast("double") *
        2.0 / 16777215.0 - 1.0
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), avg(w(col("term"))).as("margin"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("margin"), 4).as("margin"),
        round(lit(1.0) / (lit(1.0) + exp(col("margin") * -4.0)), 4).as("score"),
        (col("margin") >= 0).as("kept"))
      .orderBy(col("doc_id"))
  }
  private val q80Sql =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |         avg(('0x' || substr(md5(term), 1, 6))::BIGINT * 2.0 / 16777215.0 - 1.0)
      |           AS margin
      |  FROM tokens GROUP BY 1)
      |SELECT doc_id, n_tokens, round(margin, 4) AS margin,
      |       round(1.0 / (1.0 + exp(margin * -4.0)), 4) AS score,
      |       margin >= 0 AS kept
      |FROM scored
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q81
  /** Source-overlap forensics — the provenance audit a multi-source
    * corpus runs before mixing: which SOURCES republish each other's
    * content (mirror sites, scraper overlap), measured as distinct
    * shared span fingerprints per source pair. Reuses q73's mod-p
    * k-gram scheme (content-defined, alignment-independent); fabricated
    * mirrors (doc_id%5==0 re-published verbatim under a rotated source)
    * keep the positive path deterministic. Scale shape: only the 1-in-4
    * selected 16-byte hashes shuffle, the >64-doc boilerplate cap
    * bounds the fp self-join, and the final (src_a, src_b) aggregate is
    * at most |sources|²/2 rows — a broadcast-sized forensics report
    * regardless of corpus size. */
  private def q81(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val mirrors = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(lit("src"), pmod(col("doc_id") + 7, lit(20))).as("source"),
        col("text"))
    val w = TextOps.words(col("text"))
    val gramHashes = transform(sequence(lit(1), size(w) - 7),
      i => md5(concat_ws(" ", slice(w, i, lit(8))).cast("binary")))
    val fps = Tables.spread(docs.unionByName(mirrors))
      .where(size(w) >= 8)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(filter(gramHashes,
          h => substring(h, 32, 1).isin("0", "4", "8", "c")))).as("fp"))
    val common = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs")).where(col("n_docs") > 64)
    val rare = fps.join(broadcast(common), Seq("fp"), "left_anti")
      .select(col("source"), col("fp")).distinct()
    rare.as("a").join(rare.as("b"), Seq("fp"))
      .where(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .orderBy(col("src_a"), col("src_b"))
  }
  private val q81Sql =
    """WITH corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 4000000, 'src' || ((doc_id + 7) % 20), text
      |  FROM documents WHERE doc_id % 5 = 0),
      |w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM corpus
      |      WHERE len(string_split(text, ' ')) >= 8),
      |fp0 AS (
      |  SELECT DISTINCT doc_id, source, unnest(
      |    list_filter(
      |      list_transform(range(1, len(w) - 6),
      |        i -> md5(array_to_string(w[i:i+7], ' '))),
      |      h -> substr(h, 32, 1) IN ('0','4','8','c'))) AS fp
      |  FROM w),
      |rarefp AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) <= 64),
      |rare AS (
      |  SELECT DISTINCT f.source, f.fp FROM fp0 f JOIN rarefp USING (fp))
      |SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_fps
      |FROM rare a JOIN rare b USING (fp)
      |WHERE a.source < b.source
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ q82
  /** One corpus-scale BPE merge round — the inner step of tokenizer
    * training (Sennrich et al., ACL'16): count every ADJACENT symbol
    * pair across the corpus and rank merge candidates. The full trainer
    * is a driver loop over exactly this operator (apply merge #1,
    * recount, repeat); one round is the declared, oracle-checkable unit.
    * Scale shape: pair extraction is a per-doc window (lead over token
    * position — partitioned by doc, never global), the pair count is a
    * standard partial+final aggregate, and the top-10 lands via
    * TakeOrderedAndProject — the full pair distribution never sits on
    * one node. */
  private def q82(spark: SparkSession, dir: String): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        posexplode(TextOps.words(col("text"))).as(Seq("pos", "t1")))
      .withColumn("t2", lead(col("t1"), 1).over(byPos))
      .where(col("t2").isNotNull)
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("t1"), col("t2"))
      .limit(10)
  }
  private val q82Sql =
    """WITH tokens AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS t1
      |  FROM documents),
      |pairs AS (
      |  SELECT t1, lead(t1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
      |  FROM tokens)
      |SELECT t1, t2, count(*) AS pair_count
      |FROM pairs WHERE t2 IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY pair_count DESC, t1, t2
      |LIMIT 10""".stripMargin

  // ------------------------------------------------------------------ q93
  /** BPE merge APPLY — the other half of tokenizer training (q82 COUNTS
    * merge candidates; this applies the learned top merge to the corpus,
    * the step that runs between q82 rounds and, at inference, 32k times
    * inside the tokenizer): greedy LEFT-TO-RIGHT non-overlapping fusion
    * of the highest-count adjacent pair ("a a a" under merge (a,a) →
    * ["a_a", "a"], never ["a", "a_a"]). Scale shape: the merge pair is
    * one TakeOrderedAndProject row cross-joined as a broadcast scalar;
    * the apply is a single in-row `aggregate` fold per document — no
    * explode, no shuffle beyond the pair-count aggregate and the output
    * sort. The oracle reformulates the same greedy semantics
    * relationally (runs of consecutive matches merge at even offsets —
    * gaps-and-islands + run parity), so the two independent spellings
    * must agree on every document. */
  private def q93(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val top = docs
      .select(explode(TextOps.wordShingles(col("text"), 2)).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("sh"))
      .limit(1)
      .select(substring_index(col("sh"), " ", 1).as("mt1"),
        substring_index(col("sh"), " ", -1).as("mt2"))
    val w = TextOps.words(col("text"))
    val merged = TextOps.bpeApplyMerge(w, col("mt1"), col("mt2"))
    docs.crossJoin(broadcast(top)) // 1-row scalar: the learned merge
      .select(col("doc_id"), size(w).as("n_before"),
        size(merged).as("n_after"),
        concat_ws(" ", merged).as("text_out"))
      .orderBy(col("doc_id"))
  }
  private val q93Sql =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |pp AS (SELECT doc_id, unnest(range(1, len(w))) AS pos, w FROM words),
      |pairs AS (SELECT doc_id, pos, w[pos] AS t1, w[pos + 1] AS t2 FROM pp),
      |m AS (SELECT t1 AS mt1, t2 AS mt2 FROM (
      |        SELECT t1, t2, count(*) AS c FROM pairs GROUP BY 1, 2)
      |      ORDER BY c DESC, t1 || ' ' || t2 LIMIT 1),
      |tok AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w FROM words),
      |tt AS (SELECT doc_id, pos, w[pos] AS t,
      |              CASE WHEN pos < len(w) THEN w[pos + 1] END AS nt
      |       FROM tok),
      |p AS (SELECT tt.*, coalesce(tt.t = m.mt1 AND tt.nt = m.mt2, FALSE) AS isp
      |      FROM tt, m),
      |r AS (SELECT *, CASE WHEN isp
      |        THEN pos - ROW_NUMBER() OVER (PARTITION BY doc_id, isp ORDER BY pos)
      |      END AS grp FROM p),
      |ma AS (SELECT *, isp AND
      |         (pos - MIN(pos) OVER (PARTITION BY doc_id, grp)) % 2 = 0 AS merge_at
      |       FROM r),
      |cons AS (SELECT doc_id, pos + 1 AS pos FROM ma WHERE merge_at),
      |outt AS (SELECT ma.doc_id, ma.pos,
      |                CASE WHEN ma.merge_at THEN ma.t || '_' || ma.nt ELSE ma.t END AS otok
      |         FROM ma LEFT JOIN cons ON cons.doc_id = ma.doc_id AND cons.pos = ma.pos
      |         WHERE cons.pos IS NULL),
      |agg AS (SELECT doc_id, count(*) AS n_after,
      |               string_agg(otok, ' ' ORDER BY pos) AS text_out
      |        FROM outt GROUP BY doc_id)
      |SELECT w.doc_id, len(w.w) AS n_before, agg.n_after, agg.text_out
      |FROM words w JOIN agg USING (doc_id)
      |ORDER BY w.doc_id""".stripMargin

  // ------------------------------------------------------------------ q84
  /** LSH calibration audit — the recall/precision report a production
    * dedup pipeline runs to tune its banding (k, r, bands) before
    * trusting MinHash+LSH at full scale: on a FIXED-SIZE deterministic
    * sample (top-[[Q84_SAMPLE]] docs by md5(doc_id) — a
    * TakeOrderedAndProject, so the audit's cost is a constant independent
    * of corpus size; both endpoints must sample in for a pair to be
    * observable), compute (a) EXACT ground-truth near-dup pairs
    * (jaccard ≥ 0.5) via [[TextOps.exactNearDupPairs]] — a
    * document-frequency-capped inverted-index equi-join, no cartesian,
    * no uncapped hot-shingle blowup — and (b) the production LSH path
    * (bands → hot-bucket cap → candidates → jaccard verify), then
    * report candidate precision and verified recall. With r=2, b=4 the
    * theoretical candidate probability at j=0.5 is 1−(1−j²)⁴ ≈ 0.68 —
    * the audit makes the measured recall a declared, oracle-checked
    * number instead of folklore. */
  private def q84(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      .limit(Q84_SAMPLE)
    val sigArr = MinHashSignature.minhashSig(spark, col("sh"), K)
    val sig = docs
      .select(col("doc_id"), TextOps.shingleSet(col("text"), SHINGLE_N).as("sh"))
      .select(col("doc_id") +: col("sh") +:
        (0 until K).map(i => element_at(sigArr, i + 1).as(s"m$i")): _*)
      .persist()
    try {
      val cand = TextOps.lshCandidatePairs(
        TextOps.lshBands(sig, "doc_id", K, R), "doc_id",
        maxBucket = Some(TextOps.DefaultMaxBucket))
      val withSets = sig.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
        .join(broadcast(cand), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      val verified = withSets
        .where(TextOps.jaccardFromSets(col("sa"), col("sb")) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      // exact ground truth: df-capped inverted-index candidates, true
      // jaccard from the full sets (TextOps.exactNearDupPairs)
      val shRows = sig.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val exact = TextOps.exactNearDupPairs(shRows, "doc_id", 0.5)
        .select(col("doc_a"), col("doc_b"))
      // one pair-level frame → one aggregation; no 1-row scalar joins
      val tagged = cand.withColumn("c", lit(1L))
        .join(exact.withColumn("e", lit(1L)), Seq("doc_a", "doc_b"), "full_outer")
        .join(verified.withColumn("v", lit(1L)), Seq("doc_a", "doc_b"), "left")
      Caches.localize(tagged.agg(
          sum(coalesce(col("e"), lit(0L))).as("n_exact_pairs"),
          sum(coalesce(col("c"), lit(0L))).as("n_candidates"),
          sum(when(col("c") === 1 && col("e") === 1, 1L).otherwise(0L))
            .as("n_candidates_true"),
          sum(coalesce(col("v"), lit(0L))).as("n_verified"))
        .select(col("n_exact_pairs"), col("n_candidates"),
          col("n_candidates_true"), col("n_verified"),
          round(col("n_verified") / col("n_exact_pairs"), 4).as("recall"),
          round(col("n_candidates_true") / col("n_candidates"), 4)
            .as("cand_precision")), maxRows = 2)
        .getOrElse(sys.error("q84 audit must reduce to one row"))
    } finally sig.unpersist()
  }
  private val q84Sql =
    s"""WITH sample AS (
       |  SELECT * FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $Q84_SAMPLE),
       |${pairCtesWith("", "sample")},
       |sdf AS (SELECT shingle FROM sh GROUP BY shingle
       |  HAVING count(*) <= ${TextOps.DefaultMaxBucket}),
       |rare AS (SELECT sh.* FROM sh JOIN sdf USING (shingle)),
       |cooc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |einter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
       |  FROM cooc c JOIN sh a ON a.doc_id = c.doc_a
       |              JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2),
       |exact AS (SELECT doc_a, doc_b
       |  FROM einter JOIN sizes za ON za.doc_id = einter.doc_a
       |              JOIN sizes zb ON zb.doc_id = einter.doc_b
       |  WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= 0.5),
       |ctrue AS (SELECT count(*) AS n FROM cand c
       |  JOIN exact e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
       |SELECT
       |  (SELECT count(*) FROM exact) AS n_exact_pairs,
       |  (SELECT count(*) FROM cand) AS n_candidates,
       |  (SELECT n FROM ctrue) AS n_candidates_true,
       |  (SELECT count(*) FROM pairs) AS n_verified,
       |  round((SELECT count(*) FROM pairs) * 1.0 /
       |        (SELECT count(*) FROM exact), 4) AS recall,
       |  round((SELECT n FROM ctrue) * 1.0 /
       |        (SELECT count(*) FROM cand), 4) AS cand_precision""".stripMargin

  // ------------------------------------------------------------------ q85
  /** Cluster-canonical near-dedup (CurationPipeline.canonicalSelect):
    * cluster the verified near-dup pairs transitively and keep exactly
    * the longest member per cluster (ties to the lowest doc_id) — the
    * keep-one-survivor form of dedup that pairwise removal cannot
    * express (a chain a–b, b–c may drop both b and c). Every doc is
    * emitted with its cluster and a kept flag so drops are auditable.
    * The oracle recomputes the clusters with a recursive CTE (q59's
    * reachability) and ranks members with the same window. */
  private def q85(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val edges = nearDupPairs(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    CurationPipeline.canonicalSelect(docs, edges, length(col("text")))
      .select(col("doc_id"), col("cluster_id"), col("kept"))
      .orderBy(col("doc_id"))
  }
  private val q85Sql =
    s"""WITH RECURSIVE $pairCtes,
       |bi AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM bi
       |  UNION
       |  SELECT bi.u, reach.v FROM bi JOIN reach ON bi.v = reach.u),
       |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
       |ful AS (SELECT d.doc_id,
       |          coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
       |          length(d.text) AS q
       |        FROM documents d LEFT JOIN cl USING (doc_id)),
       |rk AS (SELECT doc_id, cluster_id,
       |         row_number() OVER (PARTITION BY cluster_id
       |                            ORDER BY q DESC, doc_id) AS rn
       |       FROM ful)
       |SELECT doc_id, cluster_id, CAST(rn = 1 AS INTEGER) AS kept
       |FROM rk ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q86
  /** Per-source cap (CurationPipeline.sourceCap, the C4/CCNet-style
    * domain cap): keep at most 10 docs per source, longest first, ties
    * to the lowest doc_id — output bounded at cap × #sources regardless
    * of corpus size. */
  private def q86(spark: SparkSession, dir: String): DataFrame =
    CurationPipeline.sourceCap(
      Tables.spread(Tables.documents(spark, dir)), cap = 10,
      priority = length(col("text")))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  private val q86Sql =
    """WITH rk AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY length(text) DESC, doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source FROM rk WHERE rn <= 10 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q87
  /** IVF-ANN recall audit — q84's calibration-audit pattern applied to
    * the vector path: run q54's IVF plan (16 cells, nprobe=2) and
    * brute-force ground truth over the SAME probes, and declare
    * recall@3 plus the candidate fraction the cell pruning actually
    * scanned. nprobe tuning at 100 TB needs this number to be a
    * measured, oracle-checked quantity, not folklore. The ground-truth
    * side is bounded by the fixed probe count (5 × corpus), the IVF
    * side is q54's own plan; both rank with the identical
    * (cos desc, vec_id) tie rule the oracle uses. */
  private def q87(spark: SparkSession, dir: String): DataFrame = {
    val K = 16
    val cents: Seq[Seq[Float]] = Tables.embeddings(spark, dir)
      .where(col("vec_id") < K).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val cand = ivfCandidates(spark, dir, cents).persist()
    try {
      val ivf = topNeighbors(cand, 3).select(col("probe_id"), col("vec_id"))
      val emb = Tables.spread(Tables.embeddings(spark, dir))
      val probes = Tables.embeddings(spark, dir)
        .where(col("vec_id") >= K && col("vec_id") < K + 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
      val bfCand = emb.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("probe_id"))
        .withColumn("cos",
          CosineSimilarity.cosineSim(spark, col("embedding"), col("probe")))
        .select(col("probe_id"), col("vec_id"), col("cos"))
      val bf = topNeighbors(bfCand, 3).select(col("probe_id"), col("vec_id"))
      val out = ivf.join(bf, Seq("probe_id", "vec_id"))
        .agg(count(lit(1)).as("h"))
        .crossJoin(cand.agg(count(lit(1)).as("nc")))
        .crossJoin(emb.agg(count(lit(1)).as("ne")))
        .select(lit(5).as("n_probes"),
          round(col("h") / 15.0, 4).as("recall_at_3"),
          round(col("nc") / (lit(5.0) * col("ne")), 4).as("avg_scan_frac"))
      Caches.localize(out, maxRows = 1)
        .getOrElse(sys.error("q87 audit must be one row"))
    } finally cand.unpersist()
  }
  private val q87Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16),
      |asg AS (
      |  SELECT vec_id,
      |    (SELECT c_id FROM c ORDER BY list_cosine_similarity(v, cv) DESC, c_id DESC
      |     LIMIT 1) AS cell
      |  FROM e),
      |p AS (SELECT vec_id AS probe_id, v AS pv FROM e
      |      WHERE vec_id >= 16 AND vec_id < 21),
      |pc AS (
      |  SELECT probe_id, c_id, row_number() OVER (PARTITION BY probe_id
      |    ORDER BY list_cosine_similarity(pv, cv) DESC, c_id DESC) AS rn
      |  FROM p CROSS JOIN c),
      |cand AS (
      |  SELECT p.probe_id, e.vec_id, list_cosine_similarity(p.pv, e.v) AS cos
      |  FROM p JOIN pc ON pc.probe_id = p.probe_id AND pc.rn <= 2
      |       JOIN asg a ON a.cell = pc.c_id
      |       JOIN e ON e.vec_id = a.vec_id
      |  WHERE e.vec_id <> p.probe_id),
      |ivf AS (SELECT probe_id, vec_id FROM cand
      |  QUALIFY row_number() OVER (PARTITION BY probe_id
      |    ORDER BY cos DESC, vec_id) <= 3),
      |bfc AS (SELECT p.probe_id, e.vec_id,
      |          list_cosine_similarity(p.pv, e.v) AS cos
      |        FROM p CROSS JOIN e WHERE e.vec_id <> p.probe_id),
      |bf AS (SELECT probe_id, vec_id FROM bfc
      |  QUALIFY row_number() OVER (PARTITION BY probe_id
      |    ORDER BY cos DESC, vec_id) <= 3)
      |SELECT 5 AS n_probes,
      |  round((SELECT count(*) FROM ivf JOIN bf USING (probe_id, vec_id)) / 15.0, 4)
      |    AS recall_at_3,
      |  round((SELECT count(*) FROM cand) /
      |        (5.0 * (SELECT count(*) FROM e)), 4) AS avg_scan_frac""".stripMargin

  // ------------------------------------------------------------------ q88
  /** k-means quantizer TRAINING (IvfIndex.kmeansTrain) under the oracle:
    * two Lloyd iterations from the deterministic first-8 seed, then the
    * final cell assignment — declared as per-cell member counts plus the
    * trained centroid norms (a compact fingerprint of the full centroid
    * vectors). The oracle unrolls both iterations in SQL: correlated
    * argmax assignment, per-dimension means with the same
    * double-accumulate-then-REAL-round rule, empty cells keeping their
    * previous centroid. This is the trainer behind q54/q65's quantizer
    * — per iteration the corpus is scanned once, assignment is a
    * map-side literal expression, and only K × dim partial-mean rows
    * ever shuffle. */
  private def q88(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cents = IvfIndex.kmeansTrain(emb, k = 8, iters = 2)
    val counts = Tables.spread(emb)
      .withColumn("c_id", IvfIndex.cellOf(spark, col("embedding"), cents))
      .groupBy(col("c_id")).agg(count(lit(1)).as("n_members"))
    val norms = cents.zipWithIndex
      .map { case (cv, i) => (i, math.sqrt(cv.map(x => x.toDouble * x).sum)) }
      .toDF("c_id", "norm")
    norms.join(counts, Seq("c_id"), "left")
      .select(col("c_id"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        round(col("norm"), 4).as("centroid_norm"))
      .orderBy(col("c_id"))
  }
  private val q88Sql = {
    def iter(n: Int, prev: String) =
      s"""a$n AS (SELECT vec_id, v,
         |  (SELECT c_id FROM $prev ORDER BY list_cosine_similarity(v, cv) DESC, c_id DESC
         |   LIMIT 1) AS cell FROM e),
         |m$n AS (SELECT cell, i, CAST(avg(v[i]) AS REAL) AS m
         |        FROM a$n CROSS JOIN range(1, 65) r(i) GROUP BY cell, i),
         |n$n AS (SELECT cell AS c_id, list(CAST(m AS DOUBLE) ORDER BY i) AS cv
         |        FROM m$n GROUP BY cell),
         |c$n AS (SELECT c0.c_id, coalesce(n$n.cv, p.cv) AS cv
         |        FROM c0 JOIN $prev p USING (c_id)
         |        LEFT JOIN n$n USING (c_id))""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |${iter(1, "c0")},
       |${iter(2, "c1")},
       |a3 AS (SELECT vec_id,
       |  (SELECT c_id FROM c2 ORDER BY list_cosine_similarity(v, cv) DESC, c_id DESC
       |   LIMIT 1) AS cell FROM e),
       |cnt AS (SELECT cell AS c_id, count(*) AS n_members FROM a3 GROUP BY cell)
       |SELECT c2.c_id, coalesce(cnt.n_members, 0) AS n_members,
       |  round(sqrt(list_aggregate(list_transform(c2.cv, x -> x * x), 'sum')), 4)
       |    AS centroid_norm
       |FROM c2 LEFT JOIN cnt USING (c_id)
       |ORDER BY c_id""".stripMargin
  }

  // ------------------------------------------------------------------ q96
  /** DATASET BUILD — the complete "corpus in, training shards out"
    * manifest, extending q89's curation-v3 chain with the two writer
    * stages (q68's packing, q71's shard assignment) so one declared
    * query covers the full path a 100 TB training-data job runs:
    *
    *   exact dedup → quality gate → canonical near-dedup → per-source
    *   cap → token accounting → per-lang sequence packing → md5 shard
    *
    * Output: one row per surviving document with its token count,
    * packed bin and shard — exactly what a shard writer consumes
    * (`write.partitionBy(shard)` of this frame IS the dataset). The
    * oracle replays all seven stages from the SHARED curation-v3 CTE
    * chain (q89 and q96 cannot drift apart stage-wise) plus the pack
    * window and shard expression; any stage reorder, threshold drift,
    * or tie-rule change flips the hash. Scale shape inherits the
    * stages': the only additions over q89 are one per-lang window and
    * a map-side md5. */
  private def q96(spark: SparkSession, dir: String): DataFrame = {
    val cfg = CurationPipeline.Config()
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val quality = CurationPipeline.qualityGate(
      CurationPipeline.exactDedup(docs), cfg)
    val (edges, cleanup) = CurationPipeline.nearDupEdges(quality, cfg)
    try {
      val canon = CurationPipeline
        .canonicalSelect(quality,
          edges.select(col("doc_a").as("src"), col("doc_b").as("dst")),
          length(col("text")))
        .where(col("kept") === 1).drop("cluster_id", "kept")
      val capped = CurationPipeline
        .sourceCap(canon, cap = 10, priority = length(col("text")))
        .withColumn("ws_tokens", size(TextOps.words(col("text"))))
      val manifest = CurationPipeline
        .packed(capped, col("lang"), col("doc_id"), col("ws_tokens"))
        .withColumn("shard",
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
        .select(col("doc_id"), col("lang"), col("source"),
          col("ws_tokens"), col("bin"), col("shard"))
        .orderBy(col("doc_id"))
      Caches.localize(manifest, maxRows = 1 << 22).getOrElse {
        val p = manifest.persist(); p.count(); p
      }
    } finally cleanup()
  }
  private val q96Sql =
    s"""WITH RECURSIVE $curationV3Ctes,
       |toks AS (
       |  SELECT doc_id, lang, source,
       |         CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens
       |  FROM capped),
       |binned AS (
       |  SELECT doc_id, lang, source, ws_tokens,
       |         CAST(floor((sum(ws_tokens) OVER (PARTITION BY lang
       |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
       |           CURRENT ROW) - ws_tokens) / 512.0) AS BIGINT) AS bin
       |  FROM toks)
       |SELECT doc_id, lang, source, ws_tokens, bin,
       |       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard
       |FROM binned ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q98
  /** Temperature UPSAMPLING — the complement of q74's downsampling and
    * the other half of multilingual data mixing: tail languages are
    * REPEATED so the mix follows c^α (α = 0.5; the largest language
    * keeps factor exactly 1.0), the standard epoch-repetition recipe
    * for low-resource languages. Per-doc repeat count is DETERMINISTIC:
    * n_copies = floor(r_lang) + 1 more iff the doc's md5 u-value falls
    * strictly below the fractional part's 6-hex threshold (q74's
    * u-value convention, so both engines compare identical strings —
    * no rand()). Emits the exploded copy manifest (doc_id, lang,
    * copy_id) a repetition-aware shard writer consumes. Scale shape:
    * per-lang factors are a tiny agg broadcast back; the copy explosion
    * is map-side `explode(sequence(...))` — one scan, no wide exchange
    * except the output sort. */
  private def q98(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val nMax = counts.agg(max(col("n")).as("n_max"))
    val factors = counts.crossJoin(broadcast(nMax))
      .withColumn("rr",
        round(sqrt(col("n_max").cast("double") / col("n")), 9))
      .select(col("lang"), col("rr"))
    val withCopies = docs.join(broadcast(factors), "lang")
      .withColumn("base", floor(col("rr")))
      .withColumn("thr", format_string("%06x",
        floor((col("rr") - floor(col("rr"))) * 16777215d).cast("int")))
      .withColumn("n_copies",
        col("base") + when(
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 6)
            < col("thr"), 1L).otherwise(0L))
      .where(col("n_copies") > 0)
    withCopies
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))
  }
  private val q98Sql =
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |m AS (SELECT max(n) AS n_max FROM c),
      |f AS (SELECT lang, round(sqrt(CAST(n_max AS DOUBLE) / n), 9) AS rr
      |      FROM c, m),
      |k AS (
      |  SELECT d.doc_id, d.lang,
      |         CAST(floor(rr) AS BIGINT) +
      |         CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) <
      |                   printf('%06x', CAST(floor((rr - floor(rr)) * 16777215)
      |                     AS INT))
      |              THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN f USING (lang))
      |SELECT doc_id, lang, unnest(range(1, n_copies + 1)) AS copy_id
      |FROM k WHERE n_copies > 0
      |ORDER BY doc_id, copy_id""".stripMargin

  // ------------------------------------------------------------------ q94
  /** Quality-classifier TRAINING (ops.LogReg) under the oracle — the
    * "train" half of q80's hashed-feature scorer (the DCLM/fastText
    * pipeline stage that learns the weights q80 then applies map-side):
    * two full-batch logistic-regression gradient steps on 16 hashed
    * token-frequency features predicting lang = 'en', declared as the
    * learned per-dim weights. The oracle unrolls both iterations in SQL
    * from the same w = 0 start (iteration 1's sigmoid(0) = 0.5 exactly,
    * so the unroll is closed-form), with the q88 determinism rule:
    * weights round to 6 decimals between iterations so double-sum order
    * differences cannot compound. Scale shape: the model rides plans as
    * a 16-double literal, per iteration one job scans the persisted
    * sparse feature table, and the driver collects exactly 16 gradient
    * rows — corpus rows never leave the cluster. */
  private def q94(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val D = 16
    val docs = Tables.spread(Tables.documents(spark, dir))
    val tok = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
    val nt = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val feat = tok
      .select(col("doc_id"), LogReg.bucketOf(col("term"), D).as("j"))
      .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("c"))
      .join(nt, "doc_id")
      .select(col("doc_id"), col("j"),
        (col("c").cast("double") / col("n")).as("x"))
      .persist()
    try {
      val labels = docs.select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      val w = LogReg.train(feat, labels, D, iters = 2)
      w.zipWithIndex.map { case (wj, j) =>
        (j, BigDecimal(wj).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.toDF("dim", "weight").orderBy(col("dim"))
    } finally { feat.unpersist(); () }
  }
  private val q94Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |feat0 AS (SELECT doc_id,
      |            CAST(('0x' || substr(md5(term), 1, 6))::BIGINT % 16 AS INT) AS j,
      |            count(*) AS c
      |          FROM tok GROUP BY 1, 2),
      |nt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
      |x AS (SELECT doc_id, j, c * 1.0 / n AS x FROM feat0 JOIN nt USING (doc_id)),
      |y AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      |      FROM documents),
      |nn AS (SELECT count(*) AS n FROM documents),
      |dims AS (SELECT unnest(range(0, 16)) AS j),
      |g1 AS (SELECT x.j, sum((0.5 - y.y) * x.x) AS g
      |       FROM x JOIN y USING (doc_id) GROUP BY 1),
      |w1 AS (SELECT dims.j,
      |         round(0.0 - coalesce(g1.g, 0.0) / (SELECT n FROM nn), 6) AS w
      |       FROM dims LEFT JOIN g1 USING (j)),
      |z2 AS (SELECT x.doc_id, sum(x.x * w1.w) AS z
      |       FROM x JOIN w1 USING (j) GROUP BY 1),
      |g2 AS (SELECT x.j, sum((1.0 / (1.0 + exp(-z2.z)) - y.y) * x.x) AS g
      |       FROM x JOIN z2 USING (doc_id) JOIN y USING (doc_id) GROUP BY 1),
      |w2 AS (SELECT w1.j, round(w1.w - coalesce(g2.g, 0.0) / (SELECT n FROM nn), 6) AS w
      |       FROM w1 LEFT JOIN g2 USING (j))
      |SELECT j AS dim, round(w, 4) AS weight FROM w2 ORDER BY dim""".stripMargin

  // ------------------------------------------------------------------ q89
  /** Curation v3 — the chain recomposed around the round's new stages:
    * exact dedup → quality gate → CANONICAL near-dedup (cluster the
    * verified pairs, keep the longest member — not pairwise
    * drop-the-higher-id) → per-SOURCE cap (10 longest per source) →
    * token accounting. One stage-order-sensitive oracle: the recursive
    * CC + both ranking windows re-run in SQL over the same intermediate
    * corpus, so a drifted stage order or tie rule hash-mismatches. */
  private def q89(spark: SparkSession, dir: String): DataFrame = {
    val cfg = CurationPipeline.Config()
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val quality = CurationPipeline.qualityGate(
      CurationPipeline.exactDedup(docs), cfg)
    val (edges, cleanup) = CurationPipeline.nearDupEdges(quality, cfg)
    try {
      val canon = CurationPipeline
        .canonicalSelect(quality,
          edges.select(col("doc_a").as("src"), col("doc_b").as("dst")),
          length(col("text")))
        .where(col("kept") === 1).drop("cluster_id", "kept")
      val out = CurationPipeline
        .sourceCap(canon, cap = 10, priority = length(col("text")))
        .select(col("doc_id"), col("lang"), col("source"),
          size(TextOps.words(col("text"))).as("ws_tokens"))
        .orderBy(col("doc_id"))
      Caches.localize(out, maxRows = 1 << 22).getOrElse {
        val p = out.persist(); p.count(); p
      }
    } finally cleanup()
  }
  /** The curation-v3 chain's CTEs through the source-capped corpus —
    * shared by q89 (token accounting tail) and q96 (pack + shard tail)
    * so the two oracles cannot drift apart stage-wise. `lazy` because
    * q96Sql initializes earlier in the object body than this val. */
  private lazy val curationV3Ctes: String = {
    val norm = "regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')"
    val nWords = "len(string_split(text, ' '))"
    val swHits = "len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a'))"
    s"""exact AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  QUALIFY row_number() OVER (PARTITION BY md5($norm) ORDER BY doc_id) = 1),
       |qual AS (
       |  SELECT doc_id, lang, source, text FROM exact
       |  WHERE $nWords >= 10
       |    AND CAST($swHits AS DOUBLE) / $nWords <= 0.5),
       |${pairCtesWith("", "qual")},
       |bi AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM bi
       |  UNION
       |  SELECT bi.u, reach.v FROM bi JOIN reach ON bi.v = reach.u),
       |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
       |canon AS (
       |  SELECT q.doc_id, q.lang, q.source, q.text FROM qual q
       |  LEFT JOIN cl USING (doc_id)
       |  QUALIFY row_number() OVER (
       |    PARTITION BY coalesce(cl.cluster_id, q.doc_id)
       |    ORDER BY length(q.text) DESC, q.doc_id) = 1),
       |capped AS (
       |  SELECT doc_id, lang, source, text FROM canon
       |  QUALIFY row_number() OVER (PARTITION BY source
       |    ORDER BY length(text) DESC, doc_id) <= 10)""".stripMargin
  }

  private val q89Sql =
    s"""WITH RECURSIVE $curationV3Ctes
       |SELECT doc_id, lang, source,
       |       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens
       |FROM capped ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ q90
  /** Cross-document boilerplate-block removal (CurationPipeline
    * .boilerplateStrip): strip every 5-token block occurring in >= 8
    * distinct docs and reassemble the survivors in order. A deterministic
    * banner ("ad click banner buy now") is prepended to every doc_id%3==0
    * doc — prepending exactly one block keeps the original block
    * boundaries intact, so the op must return those docs to their
    * original text while leaving the rest untouched (plus any naturally
    * frequent blocks, which both engines count identically). Output
    * carries the (n_blocks, n_dropped) audit columns the stage emits. */
  private def q90(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val aug = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("ad click banner buy now "), col("text")))
        .otherwise(col("text")))
    CurationPipeline.boilerplateStrip(aug, blockTokens = 5, minDocs = 8)
      .select(col("doc_id"), col("n_blocks"), col("n_dropped"),
        col("text").as("clean_text"))
      .orderBy(col("doc_id"))
  }
  private val q90Sql =
    """WITH aug AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'ad click banner buy now ' || text
      |              ELSE text END AS text
      |  FROM documents),
      |w AS (SELECT doc_id, string_split(text, ' ') AS w,
      |             CAST(ceil(len(string_split(text, ' ')) / 5.0) AS INT) AS nb
      |      FROM aug),
      |blk AS (
      |  SELECT doc_id,
      |         unnest(range(1, nb + 1)) AS bp,
      |         unnest(list_transform(range(1, nb + 1),
      |           i -> array_to_string(w[(i - 1) * 5 + 1 : i * 5], ' '))) AS blk
      |  FROM w),
      |freq AS (
      |  SELECT blk FROM (SELECT DISTINCT doc_id, blk FROM blk)
      |  GROUP BY blk HAVING count(*) >= 8),
      |kept AS (
      |  SELECT doc_id, bp, blk FROM blk
      |  WHERE blk NOT IN (SELECT blk FROM freq)),
      |clean AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         string_agg(blk, ' ' ORDER BY bp) AS clean_text
      |  FROM kept GROUP BY doc_id)
      |SELECT w.doc_id, w.nb AS n_blocks,
      |       w.nb - coalesce(c.n_kept, 0) AS n_dropped,
      |       coalesce(c.clean_text, '') AS clean_text
      |FROM w LEFT JOIN clean c USING (doc_id)
      |ORDER BY w.doc_id""".stripMargin

  // ------------------------------------------------------------- registry

  val all: Seq[Decl] = Seq(
    Decl("q51_bloom_incremental_dedup", q51, Some(q51Sql)),
    Decl("q54_ann_ivf", q54, Some(q54Sql)),
    Decl("q55_records_wire_roundtrip", q55, Some(q55Sql)),
    Decl("q58_doc_chunking", q58, Some(q58Sql)),
    Decl("q18_dedup_exact", q18, Some(q18Sql)),
    Decl("q19_minhash_signature", q19, Some(q19Sql)),
    Decl("q20_minhash_lsh_neardup", q20, Some(q20Sql)),
    Decl("q59_dedup_clusters", q59, Some(q59Sql)),
    Decl("q61_clustered_layout_scan", q61, Some(q61Sql)),
    Decl("q62_lsh_index_incremental", q62, Some(q62Sql)),
    Decl("q63_zorder_layout_scan", q63, Some(q63Sql)),
    Decl("q64_curation_pipeline", q64, Some(q64Sql)),
    Decl("q21_simhash", q21, Some(q21Sql)),
    Decl("q22_ngram_jaccard", q22, Some(q22Sql)),
    Decl("q23_knn_bruteforce", q23, Some(q23Sql)),
    Decl("q24_ann_lsh_bucketed", q24, Some(q24Sql)),
    Decl("q25_lang_id", q25, Some(q25Sql)),
    Decl("q26_quality_score", q26, Some(q26Sql)),
    Decl("q27_token_count", q27, Some(q27Sql)),
    Decl("q28_fingerprint", q28, Some(q28Sql)),
    Decl("q29_multimodal_meta", q29, Some(q29Sql)),
    Decl("q30_embedding_neardup", q30, Some(q30Sql)),
    Decl("q65_ann_ivf_persisted", q65, Some(q54Sql)),
    Decl("q66_int8_quantization", q66, Some(q66Sql)),
    Decl("q67_pii_redaction", q67, Some(q67Sql)),
    Decl("q68_sequence_packing", q68, Some(q68Sql)),
    Decl("q69_benchmark_contamination", q69, Some(q69Sql)),
    Decl("q70_repetition_ratio", q70, Some(q70Sql)),
    Decl("q71_shard_assignment", q71, Some(q71Sql)),
    Decl("q72_curation_v2", q72, Some(q72Sql)),
    Decl("q73_span_fingerprint_dedup", q73, Some(q73Sql)),
    Decl("q74_mixture_sampling", q74, Some(q74Sql)),
    Decl("q75_corpus_delta", q75, Some(q75Sql)),
    Decl("q76_unigram_lm_quality", q76, Some(q76Sql)),
    Decl("q77_semdedup", q77, Some(q77Sql)),
    Decl("q78_vocab_oov", q78, Some(q78Sql)),
    Decl("q79_random_projection", q79, Some(q79Sql)),
    Decl("q80_hashed_classifier", q80, Some(q80Sql)),
    Decl("q81_source_overlap", q81, Some(q81Sql)),
    Decl("q82_bpe_merge_round", q82, Some(q82Sql)),
    Decl("q84_lsh_calibration_audit", q84, Some(q84Sql)),
    Decl("q85_cluster_canonical", q85, Some(q85Sql)),
    Decl("q86_source_cap", q86, Some(q86Sql)),
    Decl("q87_ivf_recall_audit", q87, Some(q87Sql)),
    Decl("q88_kmeans_train", q88, Some(q88Sql)),
    Decl("q89_curation_canonical", q89, Some(q89Sql)),
    Decl("q90_boilerplate_removal", q90, Some(q90Sql)),
    Decl("q91_image_decode", q91, Some(q91Sql)),
    Decl("q92_stream_lsh_dedup", q92, Some(q62Sql)),
    Decl("q93_bpe_apply_merge", q93, Some(q93Sql)),
    Decl("q94_logreg_train", q94, Some(q94Sql)),
    Decl("q95_audio_decode", q95, Some(q95Sql)),
    Decl("q96_dataset_build", q96, Some(q96Sql)),
    Decl("q97_ann_ivf_incremental", q97, Some(q97Sql)),
    Decl("q98_temperature_upsampling", q98, Some(q98Sql)))
}

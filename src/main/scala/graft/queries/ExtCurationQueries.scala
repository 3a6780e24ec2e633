package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Caches, EventOps, GraphOps, IvfIndex, Layout, LogReg, LshIndex, TextOps}
import graft.sources.Tables
import graft.pipeline.CurationPipeline
import graft.functions.{BloomMightContain, CosineSimilarity, MinHashSignature, VectorOps}

/** Text-curation family: lang-id, quality, tokens, PII, packing,
  * contamination, mixtures, vocab, classifiers, BPE, curation
  * chains and the dataset-build manifest. */
private[queries] trait ExtCurationQueries extends ExtQueryHelpers {
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
  private[queries] def q64(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q64Sql = {
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


  // ------------------------------------------------------------------ q25
  /** Heuristic language-ID (stopword-marker scoring), aggregated per true
    * lang label — doubles as a confusion summary of the heuristic. */
  private[queries] def q25(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("pred", TextOps.langIdHeuristic(col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === "en", 1L).otherwise(0L)).as("n_pred_en"))
      .orderBy(col("lang"))
  }
  private[queries] val q25Sql =
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
  private[queries] def q26(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q26Sql =
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
  private[queries] def q27(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q27Sql =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
      |       CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpe_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin


  // ------------------------------------------------------------------ q28
  /** Rolling-hash fingerprint: min-md5 over char 8-grams, computed fully
    * within the row (array_min ∘ transform — no explode, no shuffle). */
  private[queries] def q28(spark: SparkSession, dir: String): DataFrame = {
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        TextOps.charFingerprint(col("text"), 8).as("fingerprint"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q28Sql =
    """SELECT doc_id,
      |       list_aggregate(list_transform(range(1, greatest(length(text) - 6, 1)),
      |         i -> md5(substr(text, i, 8))), 'min') AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------------------ q58
  /** Document chunking: split every document into 40-token windows with a
    * 30-token stride (10-token overlap) — the op every training-data
    * pipeline runs between curation and tokenization. All in-row: the
    * token array and the window starts are computed inside the row and
    * posexploded, so the only wide ops are the spread and the output
    * sort; chunk rows inherit the document's partitioning. */
  private[queries] def q58(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q58Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), 30)) AS st
      |      FROM t)
      |SELECT doc_id, CAST(st // 30 AS INT) AS chunk_id,
      |       array_to_string(list_slice(toks, st + 1, st + 40), ' ') AS chunk,
      |       CAST(least(40, len(toks) - st) AS INT) AS n_tokens
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin


  // ------------------------------------------------------------------ q67
  /** PII redaction (TextOps.redactPii) over documents with
    * deterministically fabricated PII (the corpus itself has none):
    * doc_id % 3 == 0 gains an email, % 5 == 0 a phone, % 15 both. Output
    * carries the full redacted text — the hash compare certifies every
    * byte of the replace chain, in both engines' regex dialects. */
  private[queries] def q67(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q67Sql =
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
  private[queries] def q68(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q68Sql =
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
    * doc_id % 10 == 0 below a FIXED id cap, plus one FABRICATED exact
    * leak per eval doc (doc_id + 1,000,000, same text) so the
    * operator's positive path is deterministic at every scale factor —
    * mirroring q67's fabricated-PII pattern. Scale shape: a real
    * benchmark is FIXED-SIZE (MBs against a 100 TB corpus), so the
    * fixture pins the eval set to `doc_id < 500` rather than a corpus
    * fraction — that keeps the broadcast side O(1) in corpus scale and
    * the match-pair output linear. (Without the cap the bench set
    * grows with the corpus and the pair output goes quadratic: the sf1
    * decade measured 17× per 10× data before the cap, 46 s at sf1.)
    * The eval trigrams BROADCAST to both the overlap join and the
    * per-benchmark totals join — the corpus side never shuffles for
    * the match; the only wide exchange is the per-pair overlap count,
    * whose input is already filtered to matching trigrams. */
  private[queries] val BenchCap = 500L
  private[queries] def q69(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val leaked = docs.where(pmod(col("doc_id"), lit(10)) === 0 &&
        col("doc_id") < BenchCap)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val tri = Tables.spread(docs.unionByName(leaked))
      .select(col("doc_id"), explode(TextOps.shingleSet(col("text"), 3)).as("sh"))
    val isBench = pmod(col("doc_id"), lit(10)) === 0 && col("doc_id") < BenchCap
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
  private[queries] val q69Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents
      |  WHERE doc_id % 10 = 0 AND doc_id < 500),
      |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
      |idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM w),
      |tri AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM idx),
      |bench AS (SELECT doc_id AS bench_id, sh FROM tri
      |          WHERE doc_id % 10 = 0 AND doc_id < 500),
      |train AS (SELECT doc_id AS train_id, sh FROM tri
      |          WHERE NOT (doc_id % 10 = 0 AND doc_id < 500)),
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
  private[queries] def q70(spark: SparkSession, dir: String): DataFrame = {
    val w = TextOps.words(col("text"))
    // bind the bigram list once per row (TextOps.bound): both aggregates
    // reference it, and the unbound lambda re-split the text per position
    val counts = TextOps.bound(TextOps.wordShingles(col("text"), 2)) { g =>
      struct(size(g).as("total"), size(array_distinct(g)).as("uniq"))
    }
    // `counts` is projected ONCE as a named column, then getField'd from
    // the attribute in a second select: referencing the struct twice in
    // one projection ran the whole shingle/transform tree twice per row —
    // codegen subexpression elimination skips trees containing lambda
    // variables (SPARK-35410), and CollapseProject keeps the two selects
    // apart (non-cheap alias, two references).
    Tables.spread(Tables.documents(spark, dir))
      .where(size(w) >= 2)
      .select(col("doc_id"), counts.as("counts"))
      .select(col("doc_id"), col("counts").getField("total").as("total_bigrams"),
        col("counts").getField("uniq").as("uniq_bigrams"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("uniq_bigrams").cast("double") / col("total_bigrams"), 4))
      .orderBy(col("doc_id"))
  }
  private[queries] val q70Sql =
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
  private[queries] def q71(spark: SparkSession, dir: String): DataFrame = {
    Tables.spread(Tables.documents(spark, dir))
      .select(
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2).as("shard"),
        size(TextOps.words(col("text"))).as("tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("shard_tokens"))
      .orderBy(col("shard"))
  }
  private[queries] val q71Sql =
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
  private[queries] def q72(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q72Sql = {
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
  private[queries] def q74(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q74Sql =
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
  private[queries] def q75(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q75Sql =
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
  private[queries] def q76(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q76Sql =
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
  private[queries] def q78(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q78Sql =
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
  private[queries] def q80(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q80Sql =
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
  private[queries] def q81(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val mirrors = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(lit("src"), pmod(col("doc_id") + 7, lit(20))).as("source"),
        col("text"))
    val w = TextOps.words(col("text"))
    // bind the token array once per row (TextOps.bound) — unbound, the
    // gram lambda re-split the text at every position (q73's fix)
    val gramFps = TextOps.bound(w) { wb =>
      array_distinct(filter(
        transform(sequence(lit(1), size(wb) - 7),
          i => md5(concat_ws(" ", slice(wb, i, lit(8))).cast("binary"))),
        h => substring(h, 32, 1).isin("0", "4", "8", "c")))
    }
    // persist the exploded fingerprints: the boilerplate-cap aggregate
    // and the anti-join's probe side are both consumers, and unpersisted
    // each re-ran the md5-gram extraction — the query's dominant compute
    // — over the full corpus (guide §5 cache-vs-recompute). The output
    // is ≤ |sources|²/2 rows: localize it, then release the cache.
    val fps = Tables.spread(docs.unionByName(mirrors))
      .where(size(w) >= 8)
      .select(col("doc_id"), col("source"), explode(gramFps).as("fp"))
      .persist()
    try {
      val common = fps.groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs")).where(col("n_docs") > 64)
      val rare = fps.join(broadcast(common), Seq("fp"), "left_anti")
        .select(col("source"), col("fp")).distinct()
      val out = rare.as("a").join(rare.as("b"), Seq("fp"))
        .where(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared_fps"))
        .orderBy(col("src_a"), col("src_b"))
      Caches.localize(out, maxRows = 1 << 20).getOrElse {
        val p = out.persist(); p.count(); p
      }
    } finally { fps.unpersist(); () }
  }
  private[queries] val q81Sql =
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
  private[queries] def q82(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q82Sql =
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
  private[queries] def q93(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q93Sql =
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


  // ----------------------------------------------------------------- q139
  /** MULTI-ROUND BPE trainer — the driver loop q82/q93 are one step of,
    * run for a fixed `q139Rounds = 8` rounds so the full
    * tokenizer-training story is under one oracle (Sennrich et al.,
    * ACL'16: repeat {count adjacent pairs; learn the top merge; apply
    * it greedily} — production runs 32k rounds of exactly this loop;
    * 8 is the declared, oracle-unrollable unit, the q88/q94
    * closed-form-iteration precedent). Each round reuses the PROVEN
    * one-step operators verbatim: q93's in-row shingle count learns the
    * merge (count desc, shingle asc — the pinned tie), and
    * `TextOps.bpeApplyMerge`'s greedy left-to-right non-overlapping
    * fusion rewrites the corpus for the next round. The declared output
    * is the learned VOCAB TABLE — (round, mt1, mt2, pair_count), the
    * artifact a tokenizer ships — and the oracle replays all 8 rounds
    * as an unrolled CTE chain (q93's gaps-and-islands apply, 8×): any
    * drift in ONE round's count, tie-break or merge application
    * cascades into every later round's counts and hash-mismatches.
    * Scale shape per round: one in-row shingle explode + partial/final
    * count + a 1-row TakeOrderedAndProject, then a map-side in-row fold
    * — the corpus text never shuffles; each round's rewrite is
    * persisted and the previous cache released, so lineage stays O(1)
    * deep instead of O(rounds). */
  private[queries] val q139Rounds = 8
  private[queries] def q139(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text")).persist()
    // the previous round's cache — released only once the CURRENT round's
    // shingle-count action has materialized `docs` through it (one fused
    // job per round: the old shape paid a separate next.count() pass —
    // a full rewrite fold + cache fill — before every round's count)
    var parent: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    try {
      for (r <- 0 until q139Rounds) {
        val (mt1, mt2, c) = docs
          .select(explode(TextOps.wordShingles(col("text"), 2)).as("sh"))
          .groupBy(col("sh")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("sh"))
          .limit(1)
          .select(substring_index(col("sh"), " ", 1),
            substring_index(col("sh"), " ", -1), col("c"))
          .as[(String, String, Long)].collect().head
        // that action scanned (and so cached) every partition of `docs` —
        // the parent cache it was computed from can go now
        parent.foreach(_.unpersist()); parent = None
        merges += ((r, mt1, mt2, c))
        if (r < q139Rounds - 1) {
          val next = docs.select(col("doc_id"),
            concat_ws(" ", TextOps.bpeApplyMerge(
              TextOps.words(col("text")), lit(mt1), lit(mt2))).as("text"))
            .persist()
          parent = Some(docs)
          docs = next
        }
      }
    } finally { docs.unpersist(); parent.foreach(_.unpersist()) }
    merges.toSeq.toDF("round", "mt1", "mt2", "pair_count")
      .orderBy(col("round"))
  }
  /** The 8-round unroll: q93's pair-count + gaps-and-islands greedy
    * apply, chained w0 → w1 → … → w8, emitting each round's learned
    * merge. Generated, not hand-written, so the round machinery cannot
    * drift between rounds. */
  private[queries] lazy val q139Sql = {
    def round(r: Int): String = {
      val w = s"w$r"; val nw = s"w${r + 1}"
      s"pp_$r AS (SELECT doc_id, unnest(range(1, len(w))) AS pos, w FROM $w),\n" +
      s"pr_$r AS (SELECT doc_id, pos, w[pos] AS t1, w[pos + 1] AS t2 FROM pp_$r),\n" +
      s"m_$r AS MATERIALIZED (SELECT t1 AS mt1, t2 AS mt2, c FROM (\n" +
      s"        SELECT t1, t2, count(*) AS c FROM pr_$r GROUP BY 1, 2)\n" +
      s"      ORDER BY c DESC, t1 || ' ' || t2 LIMIT 1),\n" +
      s"tok_$r AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w FROM $w),\n" +
      s"tt_$r AS (SELECT doc_id, pos, w[pos] AS t,\n" +
      s"              CASE WHEN pos < len(w) THEN w[pos + 1] END AS nt FROM tok_$r),\n" +
      s"p_$r AS (SELECT tt_$r.*, coalesce(t = m_$r.mt1 AND nt = m_$r.mt2, FALSE) AS isp\n" +
      s"      FROM tt_$r, m_$r),\n" +
      s"r_$r AS (SELECT *, CASE WHEN isp\n" +
      s"        THEN pos - ROW_NUMBER() OVER (PARTITION BY doc_id, isp ORDER BY pos)\n" +
      s"      END AS grp FROM p_$r),\n" +
      s"ma_$r AS MATERIALIZED (SELECT *, isp AND\n" +
      s"         (pos - MIN(pos) OVER (PARTITION BY doc_id, grp)) % 2 = 0 AS merge_at\n" +
      s"       FROM r_$r),\n" +
      s"cons_$r AS (SELECT doc_id, pos + 1 AS pos FROM ma_$r WHERE merge_at),\n" +
      s"$nw AS MATERIALIZED (SELECT ma.doc_id,\n" +
      s"          list(CASE WHEN ma.merge_at THEN ma.t || '_' || ma.nt ELSE ma.t END\n" +
      s"               ORDER BY ma.pos) AS w\n" +
      s"        FROM ma_$r ma LEFT JOIN cons_$r cons\n" +
      s"          ON cons.doc_id = ma.doc_id AND cons.pos = ma.pos\n" +
      s"        WHERE cons.pos IS NULL GROUP BY ma.doc_id)"
    }
    val rounds = (0 until q139Rounds).map(round).mkString(",\n")
    val sel = (0 until q139Rounds).map(r =>
      s"SELECT $r AS round, mt1, mt2, CAST(c AS BIGINT) AS pair_count FROM m_$r")
      .mkString("\nUNION ALL\n")
    s"WITH w0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents),\n" +
      s"$rounds\n$sel\nORDER BY round"
  }


  // ----------------------------------------------------------------- q159
  /** BATCHED BPE trainer — q139's production form (the round-13
    * verdict's watch item: one driver round-trip per merge is 32k
    * Spark jobs at the production 32k-merge scale). Each ROUND learns
    * the top-`q159M` MUTUALLY TOKEN-DISJOINT merges from ONE corpus
    * pair-count (greedy by count desc / pair asc, skipping any pair
    * sharing a token with an earlier pick — disjointness is what makes
    * simultaneous application order-independent, see
    * [[TextOps.bpeApplyMergeSet]]), then applies all of them in ONE
    * in-row rewrite pass. 32k merges thus cost 32k/m corpus passes.
    * The per-pick selection jobs run against the PERSISTED pair-count
    * table (a vocab²-bounded relation, not the corpus), so the heavy
    * per-round work — corpus explode + count + rewrite — happens once
    * per round regardless of m. Output: the learned vocab table
    * (round, slot, mt1, mt2, pair_count); the oracle unrolls both the
    * per-round greedy selection chain and the multi-pattern
    * gaps-and-islands apply, so any drift in selection order,
    * exclusion, or simultaneous application hash-mismatches. */
  /** r15: widened from m=4/rounds=2 (which proved the mechanism) to
    * m=8/rounds=3 — closer-to-production batch shape, and the wider
    * per-round greedy chain exercises the token-disjointness exclusion
    * at 8 picks (the r14 verdict's ask). The oracle SQL is GENERATED
    * from these constants, so the unrolled selection chain and the
    * apply CTEs regenerate in lockstep. */
  private[queries] val q159Rounds = 3
  private[queries] val q159M = 8

  /** The batched trainer shared by q159 (emits the learned vocab table)
    * and q160 (ships the tokenizer: applies the learned merges and
    * emits the encoded corpus). Returns the learned merges and the
    * rewritten corpus — PERSISTED; the caller unpersists. With
    * `applyLast = false` the last round's merges are learned but not
    * applied (q159 needs only the vocab); `true` applies every round so
    * the returned frame IS the fully-encoded corpus. */
  private[queries] def bpeBatchedTrain(spark: SparkSession, dir: String,
      applyLast: Boolean):
      (Seq[(Int, Int, String, String, Long)], DataFrame) = {
    import spark.implicits._
    var docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text")).persist()
    // the previous round's cache — released once this round's first pick
    // job has materialized `docs` through it (q139's fused-round rule:
    // the old shape paid a separate next.count() rewrite pass per round)
    var parent: Option[DataFrame] = None
    val learned =
      scala.collection.mutable.ArrayBuffer[(Int, Int, String, String, Long)]()
    try {
      for (r <- 0 until q159Rounds) {
        val counts = docs
          .select(explode(TextOps.wordShingles(col("text"), 2)).as("sh"))
          .groupBy(col("sh")).agg(count(lit(1)).as("c"))
          .select(substring_index(col("sh"), " ", 1).as("t1"),
            substring_index(col("sh"), " ", -1).as("t2"),
            col("sh"), col("c"))
          .persist()
        try {
          val used = scala.collection.mutable.LinkedHashSet[String]()
          var slot = 0
          var exhausted = false
          while (slot < q159M && !exhausted) {
            // tiny job: filter + top-1 on the cached vocab²-bounded table
            val pick = counts
              .where(if (used.isEmpty) lit(true)
                else !col("t1").isInCollection(used.toSeq) &&
                  !col("t2").isInCollection(used.toSeq))
              .orderBy(col("c").desc, col("sh"))
              .limit(1)
              .select(col("t1"), col("t2"), col("c"))
              .as[(String, String, Long)].collect()
            if (pick.isEmpty) exhausted = true
            else {
              val (a, b, c) = pick.head
              learned += ((r, slot, a, b, c))
              used += a; used += b
              slot += 1
            }
          }
        } finally counts.unpersist()
        // the pick jobs above scanned (and so cached) `docs` — its parent
        // cache can go now
        parent.foreach(_.unpersist()); parent = None
        if (r < q159Rounds - 1 || applyLast) {
          val merges = learned.filter(_._1 == r).map(x => (x._3, x._4)).toSeq
          val next = docs.select(col("doc_id"),
            concat_ws(" ", TextOps.bpeApplyMergeSet(
              TextOps.words(col("text")), merges)).as("text"))
            .persist()
          if (r < q159Rounds - 1) {
            // next round's pick jobs materialize `next`; defer the release
            parent = Some(docs)
          } else {
            // final applyLast rewrite: no later job follows — materialize
            // eagerly so the parent cache can be released here
            next.count()
            docs.unpersist()
          }
          docs = next
        }
      }
      (learned.toSeq, docs)
    } catch {
      case t: Throwable =>
        docs.unpersist(); parent.foreach(_.unpersist()); throw t
    }
  }

  private[queries] def q159(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (learned, docs) = bpeBatchedTrain(spark, dir, applyLast = false)
    docs.unpersist() // q159 emits only the vocab table
    learned.toDF("round", "slot", "mt1", "mt2", "pair_count")
      .orderBy(col("round"), col("slot"))
  }
  /** Unrolled mirror: per round, a greedy selection chain (each pick
    * excludes every token of the earlier picks) + one multi-pattern
    * gaps-and-islands apply. Generated like q139Sql so the round and
    * slot machinery cannot drift. */
  private def q159SelChain(r: Int): String = {
      val picks = (0 until q159M).map { j =>
        val excl = if (j == 0) "" else {
          val toks = (0 until j).flatMap(i => Seq(
            s"SELECT t1 AS t FROM s_${r}_$i",
            s"SELECT t2 AS t FROM s_${r}_$i")).mkString(" UNION ")
          s"\n      WHERE t1 NOT IN (SELECT t FROM ($toks))" +
            s" AND t2 NOT IN (SELECT t FROM ($toks))"
        }
        s"s_${r}_$j AS MATERIALIZED (SELECT t1, t2, c FROM pc_$r$excl\n" +
          s"      ORDER BY c DESC, t1 || ' ' || t2 LIMIT 1)"
      }
      val union = (0 until q159M).map(j =>
        s"SELECT $j AS slot, t1 AS mt1, t2 AS mt2, c FROM s_${r}_$j")
        .mkString(" UNION ALL ")
      (Seq(
        s"pp_$r AS (SELECT doc_id, unnest(range(1, len(w))) AS pos, w FROM w$r)",
        s"pr_$r AS (SELECT doc_id, pos, w[pos] AS t1, w[pos + 1] AS t2 FROM pp_$r)",
        s"pc_$r AS MATERIALIZED (SELECT t1, t2, count(*) AS c FROM pr_$r GROUP BY 1, 2)") ++
        picks :+ s"sel_$r AS MATERIALIZED ($union)").mkString(",\n")
  }

  private def q159ApplyCte(r: Int): String = {
      val nw = s"w${r + 1}"
      s"tok_$r AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w FROM w$r),\n" +
      s"tt_$r AS (SELECT doc_id, pos, w[pos] AS t,\n" +
      s"              CASE WHEN pos < len(w) THEN w[pos + 1] END AS nt FROM tok_$r),\n" +
      s"p_$r AS (SELECT tt.doc_id, tt.pos, tt.t, tt.nt,\n" +
      s"              s.mt1 IS NOT NULL AS isp\n" +
      s"      FROM tt_$r tt LEFT JOIN sel_$r s ON s.mt1 = tt.t AND s.mt2 = tt.nt),\n" +
      s"r_$r AS (SELECT *, CASE WHEN isp\n" +
      s"        THEN pos - ROW_NUMBER() OVER (PARTITION BY doc_id, isp ORDER BY pos)\n" +
      s"      END AS grp FROM p_$r),\n" +
      s"ma_$r AS MATERIALIZED (SELECT *, isp AND\n" +
      s"         (pos - MIN(pos) OVER (PARTITION BY doc_id, grp)) % 2 = 0 AS merge_at\n" +
      s"       FROM r_$r),\n" +
      s"cons_$r AS (SELECT doc_id, pos + 1 AS pos FROM ma_$r WHERE merge_at),\n" +
      s"$nw AS MATERIALIZED (SELECT ma.doc_id,\n" +
      s"          list(CASE WHEN ma.merge_at THEN ma.t || '_' || ma.nt ELSE ma.t END\n" +
      s"               ORDER BY ma.pos) AS w\n" +
      s"        FROM ma_$r ma LEFT JOIN cons_$r cons\n" +
      s"          ON cons.doc_id = ma.doc_id AND cons.pos = ma.pos\n" +
      s"        WHERE cons.pos IS NULL GROUP BY ma.doc_id)"
  }

  private val q159W0 =
    "WITH w0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents),\n"

  private[queries] lazy val q159Sql = {
    val body = (0 until q159Rounds).map { r =>
      if (r < q159Rounds - 1) q159SelChain(r) + ",\n" + q159ApplyCte(r)
      else q159SelChain(r)
    }.mkString(",\n")
    val sel = (0 until q159Rounds).map(r =>
      s"SELECT $r AS round, slot, mt1, mt2, CAST(c AS BIGINT) AS pair_count FROM sel_$r")
      .mkString("\nUNION ALL\n")
    s"$q159W0$body\n$sel\nORDER BY round, slot"
  }


  // ----------------------------------------------------------------- q160
  /** Tokenizer SHIP + ENCODE — the apply-side close of the trainer
    * story: run q159's batched learning, then emit the ENCODED corpus
    * fingerprint (per-doc token counts before/after + md5 of the
    * encoded text) — exactly the artifact check a tokenizer rollout
    * gates on (did every shard encode identically to the reference
    * implementation?). Because each round's merges are token-disjoint,
    * the one-pass set-apply equals sequential rank-order application
    * (TextOpsSpec), so this IS the canonical greedy BPE encode for the
    * learned table. One map-side set-apply per round — the corpus text
    * never shuffles; the only exchanges are the n_tok_before join
    * (corpus-keyed, one shuffle) and the output sort. The oracle
    * replays learning AND encoding end-to-end, so a drift anywhere in
    * the chain — selection, exclusion, application order, even one
    * byte of one doc — hash-mismatches. */
  private[queries] def q160(spark: SparkSession, dir: String): DataFrame = {
    val (_, encoded) = bpeBatchedTrain(spark, dir, applyLast = true)
    val before = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextOps.words(col("text"))).as("n_tok_before"))
    val out = encoded
      .select(col("doc_id"), size(TextOps.words(col("text"))).as("n_tok_after"),
        md5(col("text").cast("binary")).as("enc_md5"))
      .join(before, "doc_id")
      .select(col("doc_id"), col("n_tok_before"), col("n_tok_after"),
        col("enc_md5"))
      .orderBy(col("doc_id"))
    // materialize before releasing the encoded-corpus cache the plan
    // reads (the nearDupPairs rule): per-doc 4 narrow columns localize
    // within the cap; past it the fallback keeps the cluster-side cache
    val res = Caches.localize(out, maxRows = 1 << 22).getOrElse {
      val p = out.persist(); p.count(); p
    }
    encoded.unpersist()
    res
  }
  private[queries] lazy val q160Sql = {
    val body = (0 until q159Rounds).map(r =>
      q159SelChain(r) + ",\n" + q159ApplyCte(r)).mkString(",\n")
    s"$q159W0$body\n" +
      s"SELECT w0.doc_id, len(w0.w) AS n_tok_before, len(we.w) AS n_tok_after,\n" +
      s"       md5(array_to_string(we.w, ' ')) AS enc_md5\n" +
      s"FROM w0 JOIN w$q159Rounds we ON we.doc_id = w0.doc_id\n" +
      s"ORDER BY w0.doc_id"
  }


  // ----------------------------------------------------------------- q162
  /** LEAKAGE-SAFE train/val/test split — the assignment step every
    * training pipeline runs AFTER dedup, done so near-duplicates can
    * never straddle a split boundary (the classic eval-contamination
    * bug: a 90/5/5 split by doc hash puts one copy of a duplicated
    * document in train and another in test, and the eval silently
    * measures memorization). Every member of a verified near-dup
    * cluster (q59's connected components over q20's pairs) is assigned
    * by its CLUSTER CANONICAL's hash, not its own — whole clusters move
    * together; un-clustered docs anchor to themselves. Buckets come
    * from the first 4 hex digits of md5(anchor): < 90 train, < 95 val,
    * else test — deterministic, engine-portable, and stable under
    * corpus growth (a doc's split never changes when unrelated docs
    * arrive, the property incremental dataset builds need). Scale
    * shape: components is the bounded dup-graph op (O(log n)
    * large-star/small-star rounds on the pair list); the corpus-sized
    * side takes ONE broadcast left join (the dup-graph vertex set is a
    * small fraction of the corpus) and a map-side bucket expression —
    * the full corpus never shuffles except the output sort. */
  private[queries] def q162(spark: SparkSession, dir: String): DataFrame = {
    val edges = nearDupPairs(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comp = GraphOps.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    val docs = Tables.spread(Tables.documents(spark, dir)).select(col("doc_id"))
    val anchored = docs.join(broadcast(comp), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("anchor_id"))
    val bucket = pmod(
      conv(substring(md5(col("anchor_id").cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(100L))
    anchored
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q162Sql =
    s"""WITH RECURSIVE $pairCtes,
       |bi AS (SELECT doc_a AS u, doc_b AS v FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM bi
       |  UNION
       |  SELECT bi.u, reach.v FROM bi JOIN reach ON bi.v = reach.u),
       |comp AS (SELECT u AS doc_id, min(v) AS cluster_id
       |         FROM reach GROUP BY u),
       |anchored AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS anchor_id
       |  FROM documents d LEFT JOIN comp c USING (doc_id)),
       |b AS (SELECT doc_id, anchor_id,
       |        ('0x' || substr(md5(CAST(anchor_id AS VARCHAR)), 1, 4))::BIGINT
       |          % 100 AS bucket
       |      FROM anchored)
       |SELECT doc_id, anchor_id,
       |       CASE WHEN bucket < 90 THEN 'train'
       |            WHEN bucket < 95 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------------------ q86
  /** Per-source cap (CurationPipeline.sourceCap, the C4/CCNet-style
    * domain cap): keep at most 10 docs per source, longest first, ties
    * to the lowest doc_id — output bounded at cap × #sources regardless
    * of corpus size. */
  private[queries] def q86(spark: SparkSession, dir: String): DataFrame =
    CurationPipeline.sourceCap(
      Tables.spread(Tables.documents(spark, dir)), cap = 10,
      priority = length(col("text")))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  private[queries] val q86Sql =
    """WITH rk AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY length(text) DESC, doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source FROM rk WHERE rn <= 10 ORDER BY doc_id""".stripMargin


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
  private[queries] def q96(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q96Sql =
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
  private[queries] def q98(spark: SparkSession, dir: String): DataFrame = {
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
  private[queries] val q98Sql =
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
  private[queries] def q94(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val D = 16
    val docs = Tables.spread(Tables.documents(spark, dir))
    val tok = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
    // one corpus pass (the trigramFeatures rule): the per-doc token total
    // is Σc over the doc's ≤ D bucket rows — a window over the
    // (docs × ≤ D)-sized aggregate, not a second explode scan + join
    val feat = tok
      .select(col("doc_id"), LogReg.bucketOf(col("term"), D).as("j"))
      .groupBy(col("doc_id"), col("j")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("doc_id"))))
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
  private[queries] val q94Sql =
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

  // ----------------------------------------------------------------- q183
  /** CONTENT-derived language ID under the oracle — the q25 heuristic
    * upgraded to a TRAINED classifier and wired as the optional
    * curation-v3 audit stage ([[CurationPipeline.langIdAnnotate]],
    * `Config.langIdAudit`): hashed char-trigram frequency features
    * (Cavnar–Trenkle n-gram profiles → q80's md5-prefix hashing
    * convention, 32 dims) train q94's full-batch logistic regression
    * one-vs-rest against the DECLARED `lang` column (2 iterations,
    * weights 6-decimal rounded between them — the closed-form unroll
    * rule), then every doc is re-scored FROM ITS OWN BYTES and the
    * output is the per-language confusion summary (docs, predicted-en,
    * declaration agreement). The oracle unrolls the entire train +
    * score + aggregate chain in SQL — a drifted feature hash, a wrong
    * gradient, a mis-rounded weight or a flipped prediction boundary
    * all hash-mismatch. The per-doc margin rounds to 6 decimals BEFORE
    * the sign test so engine sum-order wobble (~1e-15) cannot flip a
    * prediction. Scale shape: q94's — the model rides plans as a
    * 32-double literal, per iteration one job over the persisted sparse
    * feature table, the driver collects exactly 32 gradient rows. */
  private[queries] def q183(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    // staged form + localize: the per-language summary is ≤ |langs| rows,
    // so collecting it while the trigram-feature cache is still alive
    // means the scoring pass reads the cache the trainer built instead of
    // re-deriving the features at action time (the nearDupPairs rule)
    val (annotated, release) = CurationPipeline.langIdAnnotateStaged(docs)
    try localizeRows(
      annotated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang_pred") === "en", 1L).otherwise(0L)).as("n_pred_en"),
          sum(when(col("lang_agree"), 1L).otherwise(0L)).as("n_agree"))
        .withColumn("acc_r",
          round(col("n_agree").cast("double") / col("n_docs"), 4)),
      Seq("lang"))
    finally release()
  }
  private[queries] val q183Sql =
    """WITH d AS MATERIALIZED (SELECT doc_id, lang, text FROM documents),
      |tri AS MATERIALIZED (
      |  SELECT doc_id, unnest([substr(text, CAST(i AS INT), 3)
      |                         for i in range(1, greatest(len(text) - 1, 1))])
      |           AS term
      |  FROM d),
      |feat0 AS (SELECT doc_id,
      |            CAST(('0x' || substr(md5(term), 1, 6))::BIGINT % 32 AS INT) AS j,
      |            count(*) AS c
      |          FROM tri GROUP BY 1, 2),
      |nt AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY 1),
      |x AS MATERIALIZED (SELECT doc_id, j, c * 1.0 / n AS x
      |      FROM feat0 JOIN nt USING (doc_id)),
      |y AS MATERIALIZED (SELECT doc_id,
      |        CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM d),
      |nn AS (SELECT count(*) AS n FROM d),
      |dims AS (SELECT unnest(range(0, 32)) AS j),
      |g1 AS (SELECT x.j, sum((0.5 - y.y) * x.x) AS g
      |       FROM x JOIN y USING (doc_id) GROUP BY 1),
      |w1 AS MATERIALIZED (SELECT dims.j,
      |         round(0.0 - coalesce(g1.g, 0.0) / (SELECT n FROM nn), 6) AS w
      |       FROM dims LEFT JOIN g1 USING (j)),
      |z2 AS (SELECT x.doc_id, sum(x.x * w1.w) AS z
      |       FROM x JOIN w1 USING (j) GROUP BY 1),
      |g2 AS (SELECT x.j, sum((1.0 / (1.0 + exp(-z2.z)) - y.y) * x.x) AS g
      |       FROM x JOIN z2 USING (doc_id) JOIN y USING (doc_id) GROUP BY 1),
      |w2 AS MATERIALIZED (SELECT w1.j,
      |         round(w1.w - coalesce(g2.g, 0.0) / (SELECT n FROM nn), 6) AS w
      |       FROM w1 LEFT JOIN g2 USING (j)),
      |zs AS (SELECT d.doc_id, d.lang,
      |         coalesce((SELECT sum(x.x * w2.w) FROM x JOIN w2 USING (j)
      |                   WHERE x.doc_id = d.doc_id), 0.0) AS z
      |       FROM d),
      |p AS (SELECT doc_id, lang, round(z, 6) >= 0 AS pred_en FROM zs)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN pred_en THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_pred_en,
      |       CAST(sum(CASE WHEN (lang = 'en') = pred_en THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_agree,
      |       round(sum(CASE WHEN (lang = 'en') = pred_en THEN 1 ELSE 0 END)
      |             * 1.0 / count(*), 4) AS acc_r
      |FROM p GROUP BY lang ORDER BY lang""".stripMargin

  // ----------------------------------------------------------------- q190
  /** MULTICLASS language ID under the oracle — q183's one-vs-rest
    * binary audit generalized to EVERY declared language (r17 verdict
    * #3): [[CurationPipeline.langIdAnnotateMulti]] trains one logistic
    * model per language over the shared hashed char-trigram features
    * ([[graft.ops.LogReg.trainMulti]] — per-class math and 6-decimal
    * inter-iteration rounding identical to q94's binary trainer, fused
    * into ONE job per iteration regardless of class count), scores all
    * classes in one aggregation pass and predicts argmax(z) with ties
    * toward the alphabetically-first language. The declared output is
    * the FULL confusion matrix (declared lang × predicted lang ×
    * docs). The oracle unrolls the entire per-class train + score +
    * argmax chain in SQL keyed on a class column — a drifted per-class
    * gradient, a mis-rounded weight, a wrong tie-break or a flipped
    * argmax all hash-mismatch. This is also the production
    * `Config.langIdAudit` stage's exact computation
    * (CurationPipelineSpec pins the planted-mislabel drop). Scale
    * shape: the model is dims × |langs| doubles riding plans as
    * literals; the class vocabulary is one bounded distinct-collect
    * (languages, not documents); 2 gradient jobs + 1 scoring pass over
    * the persisted sparse feature table however many languages. */
  private[queries] def q190(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    // staged + localize — q183's rule: the confusion matrix is
    // ≤ |langs|² rows, collected while the feature cache is alive
    val (annotated, release) = CurationPipeline.langIdAnnotateMultiStaged(docs)
    try localizeRows(
      annotated.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs")),
      Seq("lang", "lang_pred"))
    finally release()
  }
  private[queries] val q190Sql =
    """WITH d AS MATERIALIZED (SELECT doc_id, lang, text FROM documents),
      |tri AS MATERIALIZED (
      |  SELECT doc_id, unnest([substr(text, CAST(i AS INT), 3)
      |                         for i in range(1, greatest(len(text) - 1, 1))])
      |           AS term
      |  FROM d),
      |feat0 AS (SELECT doc_id,
      |            CAST(('0x' || substr(md5(term), 1, 6))::BIGINT % 32 AS INT) AS j,
      |            count(*) AS c
      |          FROM tri GROUP BY 1, 2),
      |nt AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY 1),
      |x AS MATERIALIZED (SELECT doc_id, j, c * 1.0 / n AS x
      |      FROM feat0 JOIN nt USING (doc_id)),
      |cls AS MATERIALIZED (SELECT DISTINCT lang AS cls FROM d),
      |y AS MATERIALIZED (SELECT d.doc_id, c.cls,
      |        CASE WHEN d.lang = c.cls THEN 1.0 ELSE 0.0 END AS y
      |      FROM d CROSS JOIN cls c),
      |nn AS (SELECT count(*) AS n FROM d),
      |dc AS (SELECT j, cls FROM (SELECT unnest(range(0, 32)) AS j)
      |       CROSS JOIN cls),
      |g1 AS (SELECT y.cls, x.j, sum((0.5 - y.y) * x.x) AS g
      |       FROM x JOIN y USING (doc_id) GROUP BY 1, 2),
      |w1 AS MATERIALIZED (SELECT dc.cls, dc.j,
      |         round(0.0 - coalesce(g1.g, 0.0) / (SELECT n FROM nn), 6) AS w
      |       FROM dc LEFT JOIN g1 ON g1.cls = dc.cls AND g1.j = dc.j),
      |z2 AS MATERIALIZED (SELECT x.doc_id, w1.cls, sum(x.x * w1.w) AS z
      |       FROM x JOIN w1 USING (j) GROUP BY 1, 2),
      |g2 AS (SELECT z2.cls, x.j,
      |         sum((1.0 / (1.0 + exp(-z2.z)) - y.y) * x.x) AS g
      |       FROM x JOIN z2 USING (doc_id)
      |            JOIN y ON y.doc_id = x.doc_id AND y.cls = z2.cls
      |       GROUP BY 1, 2),
      |w2 AS MATERIALIZED (SELECT w1.cls, w1.j,
      |         round(w1.w - coalesce(g2.g, 0.0) / (SELECT n FROM nn), 6) AS w
      |       FROM w1 LEFT JOIN g2 ON g2.cls = w1.cls AND g2.j = w1.j),
      |zs AS MATERIALIZED (SELECT x.doc_id, w2.cls, round(sum(x.x * w2.w), 6) AS z
      |       FROM x JOIN w2 USING (j) GROUP BY 1, 2),
      |zall AS (SELECT d.doc_id, d.lang, c.cls, coalesce(zs.z, 0.0) AS z
      |         FROM d CROSS JOIN cls c
      |         LEFT JOIN zs ON zs.doc_id = d.doc_id AND zs.cls = c.cls),
      |pred AS (SELECT doc_id, lang,
      |           (list(cls ORDER BY z DESC, cls))[1] AS lang_pred
      |         FROM zall GROUP BY 1, 2)
      |SELECT lang, lang_pred, count(*) AS n_docs
      |FROM pred GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin

  // ------------------------------------------------------------------ q89
  /** Curation v3 — the chain recomposed around the round's new stages:
    * exact dedup → quality gate → CANONICAL near-dedup (cluster the
    * verified pairs, keep the longest member — not pairwise
    * drop-the-higher-id) → per-SOURCE cap (10 longest per source) →
    * token accounting. One stage-order-sensitive oracle: the recursive
    * CC + both ranking windows re-run in SQL over the same intermediate
    * corpus, so a drifted stage order or tie rule hash-mismatches. */
  private[queries] def q89(spark: SparkSession, dir: String): DataFrame = {
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

  private[queries] val q89Sql =
    s"""WITH RECURSIVE $curationV3Ctes
       |SELECT doc_id, lang, source,
       |       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens
       |FROM capped ORDER BY doc_id""".stripMargin


  // ----------------------------------------------------------------- q118
  /** DSIR data selection — Data Selection with Importance Resampling
    * (Xie et al., arXiv:2302.03169): score every raw document by how
    * much its hashed-unigram bag looks like a TARGET domain (here the
    * 'en' slice plays the high-quality target, the full corpus the raw
    * pool). Both distributions live over B=64 hash buckets
    * (q80's md5-prefix convention keeps Spark and DuckDB hashing
    * identical), add-1 smoothed; a doc's log-importance weight is
    * Σ_tokens ln(p̂_target(b)/p̂_raw(b)), and selection keeps weight > 0
    * (paper samples ∝ weight; the threshold keeps the gate
    * deterministic for the oracle).
    *
    * Scale shape — DSIR's whole point, preserved here: both "models"
    * are ONE 64-row aggregate each; the bucket totals come from a
    * window over those 64 rows (never the corpus); the per-bucket
    * log-ratio table joins back BROADCAST, so scoring a 100 TB pool is
    * a map-side pass + one per-doc aggregate. No vocabulary, no
    * all-pairs anything. */
  private[queries] def q118(spark: SparkSession, dir: String): DataFrame = {
    val B = 64
    val bucket = (t: Column) =>
      pmod(conv(substring(md5(t.cast("binary")), 1, 6), 16, 10).cast("long"),
        lit(B))
    val tokens = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.words(col("text"))).as("term"))
      .select(col("doc_id"), col("lang"), bucket(col("term")).as("b"))
    // raw + target counts in ONE aggregate pass (target is a filtered
    // sum, not a second token explode + outer join)
    val cnts = tokens.groupBy(col("b")).agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_t"))
    val whole = Window.partitionBy() // ≤64 rows: totals without a collect
    val lr = cnts.select(col("b"),
      (log((col("cnt_t") + 1.0) /
          (sum(col("cnt_t")).over(whole) + B)) -
        log((col("cnt_r") + 1.0) /
          (sum(col("cnt_r")).over(whole) + B))).as("lr"))
    tokens.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("w"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("w"), 4).as("log_weight"),
        (col("w") > 0).as("selected"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q118Sql =
    """WITH tokens AS (
      |  SELECT doc_id, lang,
      |         ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 6))
      |           ::BIGINT % 64 AS b
      |  FROM documents),
      |cnts AS (
      |  SELECT b, count(*) AS cnt_r,
      |         count(*) FILTER (WHERE lang = 'en') AS cnt_t
      |  FROM tokens GROUP BY 1),
      |lr AS (
      |  SELECT b,
      |         ln((cnt_t + 1.0) / (sum(cnt_t) OVER () + 64))
      |         - ln((cnt_r + 1.0) / (sum(cnt_r) OVER () + 64)) AS lr
      |  FROM cnts)
      |SELECT doc_id, count(*) AS n_tokens,
      |       round(sum(lr), 4) AS log_weight,
      |       sum(lr) > 0 AS selected
      |FROM tokens JOIN lr USING (b)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin


  // ----------------------------------------------------------------- q119
  /** Filter-cascade attrition audit — the per-rule funnel report every
    * production curation run publishes (FineWeb/Dolma ship exactly this
    * table: how many docs each filter removed, in application order,
    * attributing each doc to the FIRST rule it fails). Rules here are
    * the repo's own curation gates: a token-count floor, a language
    * allowlist, a distinct-token (repetition) floor, and a mean-word-
    * length band. Scale shape: one map-side pass computes each doc's
    * first failing rule, one 5-row aggregate + a 5-row window cumsum
    * builds the funnel — corpus size only touches the first scan, the
    * report is O(rules) regardless of scale. */
  private[queries] def q119(spark: SparkSession, dir: String): DataFrame = {
    val w = TextOps.words(col("text"))
    val nTok = size(w)
    val nDis = size(array_distinct(w))
    val meanLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    val firstFail =
      when(nTok < 20, 1)
        .when(!col("lang").isin("en", "es", "de", "fr"), 2)
        .when(nDis.cast("double") / nTok < 0.45, 3)
        .when(meanLen < 4.0 || meanLen > 6.0, 4)
        .otherwise(0)
    val rules = Seq(1 -> "min_tokens", 2 -> "lang_allowlist",
      3 -> "distinct_ratio", 4 -> "mean_word_len")
    val ruleNames = rules.foldLeft(lit("kept")) { case (acc, (i, n)) =>
      when(col("rule_idx") === i, lit(n)).otherwise(acc)
    }
    val removed = Tables.spread(Tables.documents(spark, dir))
      // kept docs sort as pseudo-rule 5 so the cumsum sees them last
      .select(when(firstFail === 0, 5).otherwise(firstFail).as("rule_idx"))
      .groupBy(col("rule_idx")).agg(count(lit(1)).as("n"))
    // 5-row funnel: n_in of rule i = total − removals attributed before i
    val order = Window.orderBy(col("rule_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy()
    removed
      .withColumn("total", sum(col("n")).over(whole))
      .withColumn("n_in", col("total") - coalesce(sum(col("n")).over(order), lit(0L)))
      .where(col("rule_idx") <= 4)
      .select(col("rule_idx"),
        ruleNames.as("rule"),
        col("n_in"), col("n").as("n_removed"),
        (col("n_in") - col("n")).as("n_out"),
        round(col("n") * 100.0 / col("n_in"), 2).as("pct_removed"))
      .orderBy(col("rule_idx"))
  }
  private[queries] val q119Sql =
    """WITH d AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |         CASE WHEN len(w) < 20 THEN 1
      |              WHEN lang NOT IN ('en', 'es', 'de', 'fr') THEN 2
      |              WHEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w) < 0.45
      |                THEN 3
      |              WHEN (length(text) - len(w) + 1.0) / len(w) < 4.0
      |                OR (length(text) - len(w) + 1.0) / len(w) > 6.0 THEN 4
      |              ELSE 0 END AS rule_idx
      |  FROM d),
      |removed AS (
      |  SELECT CASE WHEN rule_idx = 0 THEN 5 ELSE rule_idx END AS rule_idx,
      |         count(*) AS n
      |  FROM feat GROUP BY 1),
      |funnel AS (
      |  SELECT rule_idx, n, sum(n) OVER () AS total,
      |         coalesce(sum(n) OVER (ORDER BY rule_idx
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      |  FROM removed)
      |SELECT CAST(rule_idx AS INT) AS rule_idx,
      |       CASE rule_idx WHEN 1 THEN 'min_tokens' WHEN 2 THEN 'lang_allowlist'
      |            WHEN 3 THEN 'distinct_ratio' ELSE 'mean_word_len' END AS rule,
      |       CAST(total - before AS BIGINT) AS n_in, n AS n_removed,
      |       CAST(total - before - n AS BIGINT) AS n_out,
      |       round(n * 100.0 / (total - before), 2) AS pct_removed
      |FROM funnel
      |WHERE rule_idx <= 4
      |ORDER BY rule_idx""".stripMargin


  // ----------------------------------------------------------------- q122
  /** Bigram-LM quality scoring with Stupid Backoff (Brants et al.,
    * EMNLP 2007, "Large Language Models in Machine Translation") — the
    * step past q76's unigram surprisal and the shape of CCNet/KenLM
    * perplexity filters: train the LM on a HELD 10% slice (doc_id % 10 = 0), score
    * EVERY doc by mean log-score of its bigram transitions, where
    * S(w₂|w₁) = cnt(w₁w₂)/cnt(w₁) when the bigram was seen, else
    * 0.4 · (cnt(w₂)+1)/(N+V) (the paper's α=0.4 backoff into an add-1
    * unigram, so unseen unigrams stay finite). Training on a strict
    * subset makes the backoff path REAL: held-out docs contain unseen
    * bigrams, and both engines must take the same branch per position.
    *
    * Scale shape: bigram formation is IN-ROW (a transform over the
    * token array — no (doc,pos) self-join shuffle); the LM tables join
    * back BROADCAST (production prunes to top-N n-grams exactly so this
    * fits — the paper's own serving trick); corpus totals come from a
    * window over the vocab-sized aggregate, never the corpus. Scoring
    * 100 TB is a map-side pass + one per-doc aggregate. */
  private[queries] def q122(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val w = TextOps.words(col("text"))
    // size(w) < 2 would make sequence(1, 0) DESCENDING and element_at(w, 0)
    // throw — guard like TextOps.wordShingles (DuckDB's range(1, len) is
    // already empty there, so the guarded form keeps oracle parity).
    val bigrams = TextOps.bound(w) { wb =>
      // bound: the element_at lambda re-split the text twice per position
      when(size(wb) >= 2,
        transform(sequence(lit(1), size(wb) - 1),
          i => concat(element_at(wb, i), lit(" "), element_at(wb, i + 1))))
        .otherwise(array().cast("array<string>"))
    }
    val held = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val uniCnt = held
      .select(explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt_u"))
    val tot = uniCnt.agg(sum(col("cnt_u")).as("n_total"),
      count(lit(1)).as("vocab")) // one row: LM normalization constants
    val bigCnt = held.select(explode(bigrams).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt_b"))
    docs
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(broadcast(bigCnt), Seq("bg"), "left")
      .join(broadcast(uniCnt.select(col("term").as("w1"),
        col("cnt_u").as("cnt_w1"))), Seq("w1"), "left")
      .join(broadcast(uniCnt.select(col("term").as("w2"),
        col("cnt_u").as("cnt_w2"))), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        when(col("cnt_b").isNotNull && col("cnt_w1").isNotNull,
          log(col("cnt_b").cast("double") / col("cnt_w1")))
          .otherwise(log(lit(0.4) *
            (coalesce(col("cnt_w2"), lit(0L)) + 1.0) /
            (col("n_total") + col("vocab")))).as("lp"),
        when(col("cnt_b").isNull || col("cnt_w1").isNull, 1L)
          .otherwise(0L).as("backoff"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("backoff")).as("n_backoff"),
        round(avg(col("lp")), 4).as("mean_logscore"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q122Sql =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(w)),
      |           i -> w[i] || ' ' || w[i + 1])) AS bg
      |  FROM d),
      |held_uni AS (
      |  SELECT term, count(*) AS cnt_u FROM (
      |    SELECT unnest(w) AS term FROM d WHERE doc_id % 10 = 0)
      |  GROUP BY 1),
      |tot AS (SELECT sum(cnt_u) AS n_total, count(*) AS vocab FROM held_uni),
      |held_big AS (
      |  SELECT bg, count(*) AS cnt_b FROM bg WHERE doc_id % 10 = 0 GROUP BY 1),
      |pos AS (
      |  SELECT b.doc_id,
      |         CASE WHEN hb.cnt_b IS NOT NULL AND u1.cnt_u IS NOT NULL
      |              THEN ln(hb.cnt_b * 1.0 / u1.cnt_u)
      |              ELSE ln(0.4 * (coalesce(u2.cnt_u, 0) + 1.0)
      |                      / (tot.n_total + tot.vocab)) END AS lp,
      |         CASE WHEN hb.cnt_b IS NULL OR u1.cnt_u IS NULL
      |              THEN 1 ELSE 0 END AS backoff
      |  FROM bg b
      |  LEFT JOIN held_big hb USING (bg)
      |  LEFT JOIN held_uni u1 ON u1.term = string_split(b.bg, ' ')[1]
      |  LEFT JOIN held_uni u2 ON u2.term = string_split(b.bg, ' ')[2]
      |  CROSS JOIN tot)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(backoff) AS BIGINT) AS n_backoff,
      |       round(avg(lp), 4) AS mean_logscore
      |FROM pos GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin


  // ----------------------------------------------------------------- q136
  /** Token frequency SPECTRUM (frequency-of-frequencies) — the Zipf
    * audit tokenizer and vocabulary planning starts from: for every
    * occurrence count k, how many distinct terms occur exactly k times
    * and what corpus mass they carry. The hapax row (k=1) sizes the
    * vocabulary tail a BPE merge table must absorb; the top-k rows are
    * the stopword mass a filter cascade discounts. Scale shape: two
    * aggregations — term→count (map-side partial, the corpus-sized
    * shuffle the tokenizer already pays) then count→(n_terms, mass)
    * over the vocab-sized frame; output is the distinct-count set,
    * O(√corpus) rows by Zipf's law, no limit needed. */
  private[queries] def q136(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.spread(Tables.documents(spark, dir))
      .select(explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("k"))
    tf.groupBy(col("k"))
      .agg(count(lit(1)).as("n_terms"),
        (count(lit(1)) * col("k")).as("occurrences"))
      .select(col("k"), col("n_terms"), col("occurrences"))
      .orderBy(col("k"))
  }
  private[queries] val q136Sql =
    """WITH tf AS (
      |  SELECT term, count(*) AS k
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY term)
      |SELECT k, count(*) AS n_terms,
      |       CAST(count(*) * k AS BIGINT) AS occurrences
      |FROM tf GROUP BY k ORDER BY k""".stripMargin


  // ----------------------------------------------------------------- q130
  /** BM25 top-k retrieval — the ranked-search operator a training
    * pipeline runs for decontamination forensics, RAG-corpus curation
    * and eval-set mining (TF-IDF ranks terms per doc, q38; THIS ranks
    * docs per query): Okapi BM25 (k1=1.2, b=0.75) of 4 two-term
    * queries derived deterministically from the corpus itself (the 8
    * highest-df terms, paired by rank), scored over the full corpus
    * and cut to the top 10 docs per query. Plan shape for 100 TB: the
    * doc length rides INTO the term-frequency aggregation (max(dl)
    * per (doc,term) group — no second corpus join), document
    * frequency and the query set reduce to ≤vocab-size aggregates of
    * which only 8 rows and one (N, avgdl) scalar row survive — both
    * broadcast — so the corpus-sized side shuffles exactly twice
    * (tokenize→tf, then the per-query partial top-k); ranking is a
    * per-query window AFTER the groupBy collapses to (query, doc)
    * rows. Summation per (query,doc) is ≤2 addends, so double
    * determinism holds without ordering tricks (IEEE addition is
    * commutative). */
  private[queries] def q130(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val tokens = docs.select(col("doc_id"),
      size(TextOps.words(col("text"))).as("dl"),
      explode(TextOps.words(col("text"))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // Document frequency FROM the tf table (one row per (doc, term)
    // already) — no second corpus tokenize + distinct shuffle; Catalyst
    // reuses tf's exchange for both consumers.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qt = df.orderBy(col("df").desc, col("term")).limit(8)
      .withColumn("r", row_number().over(
        Window.orderBy(col("df").desc, col("term"))))
      .select(((col("r") - 1) / 2).cast("bigint").as("query_id"),
        col("term"), col("df"))
    val stats = docs.agg(count(lit(1)).as("n"),
      avg(size(TextOps.words(col("text")))).as("avgdl"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfn = (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s", idf * tfn)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10)
      .select(col("query_id"), col("doc_id"),
        round(col("score"), 4).as("bm25"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }
  private[queries] val q130Sql =
    """WITH tokens AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
      |       FROM tokens GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df
      |       FROM (SELECT DISTINCT doc_id, term FROM tokens) GROUP BY 1),
      |qt AS (SELECT (row_number() OVER (ORDER BY df DESC, term) - 1) // 2
      |                 AS query_id, term, df
      |       FROM df ORDER BY df DESC, term LIMIT 8),
      |stats AS (SELECT count(*) AS n,
      |                 avg(len(string_split(text, ' '))) AS avgdl
      |          FROM documents),
      |scored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |         ln((stats.n - qt.df + 0.5) / (qt.df + 0.5) + 1.0) *
      |         ((tf.tf * 2.2) /
      |          (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))) AS s
      |  FROM tf JOIN qt ON tf.term = qt.term CROSS JOIN stats),
      |agg AS (SELECT query_id, doc_id, sum(s) AS score
      |        FROM scored GROUP BY 1, 2)
      |SELECT query_id, doc_id, round(score, 4) AS bm25,
      |       row_number() OVER (PARTITION BY query_id
      |                          ORDER BY score DESC, doc_id) AS rn
      |FROM agg
      |QUALIFY rn <= 10
      |ORDER BY query_id, rn""".stripMargin


  // ----------------------------------------------------------------- q131
  /** Unicode NFC normalization under the oracle — the canonical-
    * equivalence pass every multilingual corpus needs before dedup and
    * tokenization (decomposed e+U+0301 and precomposed é must produce
    * one dedup key, or accented duplicates survive): each document's
    * text is augmented with DECOMPOSED sequences (e + combining acute,
    * A + combining ring above), pushed through the native codegen'd
    * [[graft.functions.NfcNormalize]] expression (Spark has no
    * normalization built-in — this is the (b)-tier custom Expression,
    * whole-stage-codegen'd with an ASCII fast path that skips the
    * String round-trip on the ~all-ASCII hot path), and keyed by md5
    * of the composed bytes. The oracle runs DuckDB's independent
    * `nfc_normalize` implementation over the same construction — two
    * unrelated normalizers agreeing on code-point counts AND exact
    * UTF-8 digest is the correctness contract. Map-only: no shuffle
    * but the final presentation sort. */
  private[queries] def q131(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(substring(col("text"), 1, 16),
      lit(" caf"), lit("e\u0301"), lit(" "), lit("A\u030A"))
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        length(col("aug")).as("raw_len"),
        length(graft.functions.NfcNormalize.nfc(spark, col("aug"))).as("norm_len"),
        md5(graft.functions.NfcNormalize.nfc(spark, col("aug")).cast("binary"))
          .as("norm_md5"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q131Sql =
    """WITH a AS (
      |  SELECT doc_id,
      |         substr(text, 1, 16) || ' caf' || chr(101) || chr(769) ||
      |         ' ' || chr(65) || chr(778) AS aug
      |  FROM documents)
      |SELECT doc_id, length(aug) AS raw_len,
      |       length(nfc_normalize(aug)) AS norm_len,
      |       md5(nfc_normalize(aug)) AS norm_md5
      |FROM a ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------- q142
  /** Classifier calibration audit: AUC of q80's quality model against a
    * reference label — the monitoring query every classifier-filtered
    * corpus runs per ingest batch (a silently drifting filter model is
    * how quality regressions ship). Label = `lang = 'en'`, score = the
    * hashed-feature margin; AUC comes from the rank-sum identity over a
    * FIXED 1024-bin score histogram (margin ∈ [−1,1] → bin
    * ⌊(margin+1)·512⌋, tie mass contributes 0.5 — the binned/tied AUC
    * estimator). Binning is the scale move: per-(bin,label) counts
    * reduce map-side, the rank-sum window runs over ≤1024 rows of
    * global state regardless of corpus size — never a corpus-wide sort.
    * Every AUC term is an exact-in-double product of counts and a half
    * (multiples of 0.5), so partial-sum order cannot flip a digit and
    * the estimate itself is oracle-matched, not bound-checked. */
  private[queries] def q142(spark: SparkSession, dir: String): DataFrame = {
    val w = (t: Column) =>
      conv(substring(md5(t.cast("binary")), 1, 6), 16, 10).cast("double") *
        2.0 / 16777215.0 - 1.0
    val scored = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(avg(w(col("term"))).as("margin"))
    val per = scored.select(
      least(greatest(floor((round(col("margin"), 6) + 1.0) * 512.0)
        .cast("int"), lit(0)), lit(1023)).as("bin"),
      (col("lang") === "en").cast("int").as("pos"))
      .groupBy(col("bin"))
      .agg(sum(col("pos")).as("np"),
        (count(lit(1)) - sum(col("pos"))).as("nn"))
    val win = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per.withColumn("cum_nn", coalesce(sum(col("nn")).over(win), lit(0L)))
      .agg(sum(col("np")).as("p"), sum(col("nn")).as("n"),
        count(lit(1)).as("n_bins_used"),
        sum(col("np") * (col("cum_nn") + lit(0.5) * col("nn"))).as("u"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        col("n_bins_used"),
        round(col("u") / (col("p") * col("n")), 4).as("auc"))
  }
  private[queries] val q142Sql =
    """WITH tokens AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang,
      |         avg(('0x' || substr(md5(term), 1, 6))::BIGINT * 2.0 / 16777215.0 - 1.0)
      |           AS margin
      |  FROM tokens GROUP BY 1, 2),
      |binned AS (
      |  SELECT least(greatest(CAST(floor((round(margin, 6) + 1.0) * 512.0) AS INT),
      |                        0), 1023) AS bin,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM scored),
      |per AS (
      |  SELECT bin, SUM(pos) AS np, COUNT(*) - SUM(pos) AS nn
      |  FROM binned GROUP BY 1),
      |cum AS (
      |  SELECT bin, np, nn,
      |         COALESCE(SUM(nn) OVER (ORDER BY bin
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
      |  FROM per)
      |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
      |       CAST(SUM(nn) AS BIGINT) AS n_neg,
      |       CAST(COUNT(*) AS BIGINT) AS n_bins_used,
      |       round(SUM(np * (cum_nn + 0.5 * nn)) /
      |             (CAST(SUM(np) AS BIGINT) * CAST(SUM(nn) AS BIGINT)), 4) AS auc
      |FROM cum""".stripMargin

  // ----------------------------------------------------------------- q143
  /** Token-entropy quality signal: Shannon entropy (bits/token) of each
    * document's unigram distribution plus type–token ratio — the
    * repetition/gibberish detector that complements q70's surface
    * repetition ratio (entropy catches distributional degeneracy q70's
    * fixed n-gram window misses: a doc cycling 3 tokens in varying
    * order has high 10-gram diversity but ~1.58 bits of entropy).
    * H = log2(n) − Σ cnt·log2(cnt) / n, computed from the per-term
    * count table. `kept` thresholds the ROUNDED entropy so an
    * engine-ulp difference in log2 can never flip the boolean without
    * also flipping the (already-matched) rounded value. Scale shape:
    * two keyed aggregations with map-side partials, the heavy one on
    * (doc, term); no corpus-wide state, no window. */
  private[queries] def q143(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val h = round(log2(col("n")) - col("sl") / col("n"), 4)
    tc.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("cnt") * log2(col("cnt"))).as("sl"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        h.as("entropy_bits"),
        round(col("n_distinct").cast("double") / col("n"), 4).as("ttr"),
        (h >= 3.0).as("kept"))
      .orderBy(col("doc_id"))
  }
  private[queries] val q143Sql =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tc AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM tokens GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n,
      |         CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |         SUM(cnt * log2(cnt)) AS sl
      |  FROM tc GROUP BY 1)
      |SELECT doc_id, n AS n_tokens, n_distinct,
      |       round(log2(n) - sl / n, 4) AS entropy_bits,
      |       round(CAST(n_distinct AS DOUBLE) / n, 4) AS ttr,
      |       round(log2(n) - sl / n, 4) >= 3.0 AS kept
      |FROM agg ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------------- q145
  /** Weighted corpus sampling via PRIORITY SAMPLING (Duffield–Lund–
    * Thorup, JACM 2007) — the principled way to draw a fixed-size
    * weighted subsample per source whose subset-sum estimates are
    * unbiased: priority = w/u with u a (0,1] uniform, keep the top-k
    * priorities, estimate each kept item's weight as max(w, τ) where τ
    * is the (k+1)-th priority. Two properties make it the 100 TB
    * choice over Efraimidis–Spirakis keys: the priority needs NO
    * transcendentals (u comes from md5 bits, so one multiply + one
    * divide — bit-identical across engines, which is why the SAMPLE
    * ITSELF is oracle-matched, not just its size), and τ is the only
    * cross-item state (one scalar per source). Weight = n_chars (the
    * token-budget proxy). Scale shape: per-source top-(k+1) — the
    * window spelling here; at fleet scale the same selection runs as a
    * bounded per-partition heap + merge (q12's top-k discussion) since
    * only k+1 rows per source ever matter. */
  private[queries] def q145(spark: SparkSession, dir: String): DataFrame = {
    val k = 20
    val h48 = conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long")
    // u = (h48+1)/2^48 in (0,1]; priority = w/u, spelled so both
    // engines run the identical IEEE op sequence.
    val priority = (col("n_chars").cast("double") *
      lit(281474976710656.0)) / (h48 + lit(1L))
    val scored = Tables.spread(Tables.documents(spark, dir))
      .select(col("source"), col("doc_id"), col("n_chars"),
        priority.as("priority"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    val ranked = scored.withColumn("rk", row_number().over(win))
    val tau = ranked.where(col("rk") === k + 1)
      .select(col("source"), col("priority").as("tau"))
    ranked.where(col("rk") <= k)
      .join(broadcast(tau), Seq("source"), "left")
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("priority"), 4).as("priority"),
        round(greatest(col("n_chars").cast("double"),
          coalesce(col("tau"), lit(0.0))), 4).as("est_weight"))
      .orderBy(col("source"), col("doc_id"))
  }
  private[queries] val q145Sql =
    """WITH pr AS (
      |  SELECT source, doc_id, n_chars,
      |         (CAST(n_chars AS DOUBLE) * 281474976710656.0) /
      |         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1)
      |           AS priority
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, n_chars, priority,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY priority DESC, doc_id) AS rk
      |  FROM pr),
      |tau AS (SELECT source, priority AS tau FROM ranked WHERE rk = 21)
      |SELECT r.source, r.doc_id, r.n_chars,
      |       round(r.priority, 4) AS priority,
      |       round(greatest(CAST(r.n_chars AS DOUBLE), COALESCE(t.tau, 0.0)), 4)
      |         AS est_weight
      |FROM ranked r LEFT JOIN tau t USING (source)
      |WHERE r.rk <= 20
      |ORDER BY r.source, r.doc_id""".stripMargin

  // ----------------------------------------------------------------- q153
  /** URL canonicalization + crawl-frontier dedup — the step a crawl
    * pipeline runs BEFORE any fetch or text dedup: the same page
    * arrives as `HTTPS://WWW.Host.COM:443/Docs/3/?utm_campaign=x#frag`
    * and `https://host.com/Docs/3`, and canonicalizing (lowercase
    * scheme+host, strip `www.`, strip the default port, drop the
    * fragment, drop tracking params (utm_ prefix, ref) — keep real params,
    * strip the trailing slash) collapses them. Each document renders a
    * deliberately-messy raw URL from table formulas (mixed case, :443,
    * trailing slash, utm/ref params, fragments — each on its own
    * doc_id modulus so every rule fires on a known slice); the engine
    * canonicalizes FROM THE RAW STRING with codegen'd regexp/array ops
    * (no UDFs), while the oracle recomputes the canonical form
    * CLOSED-FORM from the columns — the hash only matches if every
    * rule fired exactly (the per-domain distinct count and canonical
    * byte sum pin the exact strings). Scale shape: pure map-side
    * string work + one per-domain aggregate; the frontier dedup at
    * 100 TB is a groupBy on the canonical hash. */
  private[queries] def q153(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val raw = concat(
      when(id % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
      lit("WWW."), col("source"), lit(".Example.COM"),
      when(id % 6 === 0, ":443").otherwise(""),
      lit("/Docs/"), (id % 50).cast("string"),
      when(id % 4 === 0, "/").otherwise(""),
      when(id % 5 === 0, concat(lit("?utm_campaign=Spring&page="),
        (id % 3).cast("string")))
        .when(id % 5 === 1, concat(lit("?page="), (id % 3).cast("string"),
          lit("&utm_source=feed")))
        .otherwise(""),
      when(id % 3 === 0, "#sec").otherwise(""))
    val noFrag = regexp_replace(raw, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1)),
        ":443$", ""),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+(/[^?#]*)?", 1), "/$", "")
    val params = filter(split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      p => !(p.startsWith("utm_") || p.startsWith("ref=") || p === ""))
    val canonical = concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(""))
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), canonical.as("canonical"))
      .withColumn("domain", regexp_extract(col("canonical"), "^https://([^/]+)", 1))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canonical")).as("n_canonical"),
        sum(length(col("canonical"))).as("canonical_bytes"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("domain"))
  }
  private[queries] val q153Sql =
    """WITH c AS (
      |  SELECT doc_id, source || '.example.com' AS domain,
      |         'https://' || source || '.example.com/Docs/' ||
      |         CAST(doc_id % 50 AS VARCHAR) ||
      |         CASE WHEN doc_id % 5 IN (0, 1)
      |              THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
      |              ELSE '' END AS canonical
      |  FROM documents)
      |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
      |       CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
      |       CAST(sum(length(canonical)) AS BIGINT) AS canonical_bytes,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc
      |FROM c GROUP BY domain ORDER BY domain""".stripMargin
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained MinHash+LSH near-duplicate index —
  * the continuously-ingesting form of the single-job `nearDupPairs` plan
  * (ExtQueries q20). One-shot LSH recomputes every signature on every
  * run: at 100 TB that is a full-corpus scan + md5 pass per ingest batch.
  * The index amortizes it: signatures and band rows are computed ONCE per
  * document, written to storage, and each ingest batch pays only
  *
  *   O(|batch| signatures) + O(index rows in touched buckets)
  *
  * — the index scan is a broadcast-probed join against a table that is
  * ~1-2% the corpus size, and only buckets the batch touches are read
  * into the candidate join.
  *
  * Storage layout (`<path>/bands`, `<path>/sigs`):
  *   - `bands` (band, key, doc_id): `Layout.clusteredWrite` on
  *     (band, key) — files and row groups cover disjoint band/key
  *     ranges, so per-bucket maintenance reads (compaction, hot-bucket
  *     re-audit, a static key-range probe) prune to the files that hold
  *     the range. At 100 TB this table is additionally `partitionBy`'d
  *     on a key prefix so appends stay file-local.
  *   - `sigs` (doc_id, sh): the per-doc DISTINCT shingle set, clustered
  *     on doc_id — exact-jaccard verification fetches only candidate
  *     docs' rows, and the clustering keeps those fetches row-group-
  *     prunable under pushed id ranges.
  *
  * Probe semantics match the one-shot operator exactly: the hot-bucket
  * cap (TextOps.capHotBuckets) counts the FULL combined bucket (index +
  * batch members), so a bucket that crosses the cap only after the batch
  * lands is dropped just as a full recompute would drop it. New-vs-new
  * pairs inside the batch are found in the same pass as new-vs-old —
  * the batch's own band rows ride the combined table.
  *
  * Append-only: `probeAndAppend` writes the batch's bands/sigs into the
  * index after probing, so the next batch sees them. Deletions are out
  * of scope (training corpora are append-only; a tombstone column is the
  * standard extension).
  */
object LshIndex {

  case class Config(
      shingleN: Int = 2, k: Int = 8, r: Int = 2,
      jaccardThreshold: Double = 0.5,
      maxBucket: Option[Int] = Some(TextOps.DefaultMaxBucket),
      bandFiles: Int = 8, sigFiles: Int = 8)

  private def bandsPath(path: String) = s"$path/bands"
  private def sigsPath(path: String) = s"$path/sigs"

  /** (doc_id, sh, m0..m(k-1)) — one row per doc, all map-side.
    * Shingle-less docs are dropped: they have no minima (null band keys)
    * and can never pair. */
  private def signatures(docs: DataFrame, cfg: Config,
      id: String, text: String): DataFrame =
    docs.select(col(id), TextOps.shingleSet(col(text), cfg.shingleN).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col(id) +: col("sh") +:
        TextOps.minhashFromSet(col("sh"), cfg.k): _*)

  /** Build the index at `path` from a base corpus (full recompute — run
    * once; subsequent batches go through [[probeAndAppend]]). */
  def build(docs: DataFrame, path: String, cfg: Config = Config(),
      id: String = "doc_id", text: String = "text"): Unit = {
    val sig = signatures(docs, cfg, id, text).persist()
    try {
      Layout.clusteredWrite(
        TextOps.lshBands(sig, id, cfg.k, cfg.r)
          .select(col("band"), col("key"), col(id).as("doc_id")),
        bandsPath(path), cfg.bandFiles, col("band"), col("key"))
      Layout.clusteredWrite(
        sig.select(col(id).as("doc_id"), col("sh")),
        sigsPath(path), cfg.sigFiles, col("doc_id"))
    } finally sig.unpersist()
  }

  /** Probe the index with an ingest batch: returns the verified NEW
    * near-dup pairs (doc_a, doc_b, jaccard ≥ threshold; at least one side
    * from the batch; doc_a < doc_b), then appends the batch's bands and
    * shingle sets to the index so the next batch sees them.
    *
    * The returned pair list is localized (it is orders of magnitude
    * smaller than the batch) so no cache outlives the call. */
  def probeAndAppend(spark: SparkSession, path: String, newDocs: DataFrame,
      cfg: Config = Config(), id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val sig = signatures(newDocs, cfg, id, text).persist()
    try {
      val newBands = TextOps.lshBands(sig, id, cfg.k, cfg.r)
        .select(col("band"), col("key"), col(id).as("doc_id"))
      // Only buckets the batch touches can yield new pairs; the semi join
      // keeps every member of a touched bucket (so the hot-bucket count
      // below is the bucket's FULL size), and the batch's distinct keys
      // broadcast — the index side streams, never shuffles.
      val touchedKeys = newBands.select(col("band"), col("key")).distinct()
      val indexBands = spark.read.parquet(bandsPath(path))
        .join(broadcast(touchedKeys), Seq("band", "key"), "left_semi")
      val combined = indexBands.withColumn("is_new", lit(false))
        .unionByName(newBands.withColumn("is_new", lit(true)))
      val pruned = cfg.maxBucket match {
        case Some(m) =>
          TextOps.capHotBuckets(combined, Seq("band", "key"), m, "lsh_index_hot_buckets")
        case None => combined
      }
      val a = pruned.select(col("band"), col("key"),
        col("doc_id").as("doc_a"), col("is_new").as("na"))
      val b = pruned.select(col("band"), col("key"),
        col("doc_id").as("doc_b"), col("is_new").as("nb"))
      val cand = a.join(b, Seq("band", "key"))
        .where(col("doc_a") < col("doc_b") && (col("na") || col("nb")))
        .select(col("doc_a"), col("doc_b")).distinct()
      // Exact verification: shingle sets come from the index for old
      // docs, from the in-memory batch for new ones. Candidates are rare
      // -> broadcast them onto both set lookups (map-side joins).
      val sets = spark.read.parquet(sigsPath(path))
        .unionByName(sig.select(col(id).as("doc_id"), col("sh")))
      val withSets = sets.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
        .join(broadcast(cand), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      val j = TextOps.jaccardFromSets(col("sa"), col("sb"))
      val pairs = withSets.where(j >= cfg.jaccardThreshold)
        .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
      val result = Caches.localize(pairs, maxRows = 1 << 20).getOrElse {
        val p = pairs.persist(); p.count(); p
      }
      // Append AFTER the probe is materialized: the probe must see the
      // pre-batch index, and the localized result no longer reads it.
      newBands.write.mode("append").parquet(bandsPath(path))
      sig.select(col(id).as("doc_id"), col("sh"))
        .write.mode("append").parquet(sigsPath(path))
      result
    } finally sig.unpersist()
  }
}

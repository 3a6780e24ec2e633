package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins changelog merge — the CDC/upsert primitive every
  * lakehouse table format runs (Delta/Iceberg/Hudi `MERGE`; Debezium →
  * table materialization). A changelog row is (key, seq, op, payload…)
  * with `op` ∈ {`u` upsert, `d` delete}; applying a changelog to a base
  * snapshot keeps, per key, the row with the highest sequence number,
  * and drops the key entirely when that winner is a delete (the
  * tombstone). A key never touched by the changelog keeps its base row.
  *
  * Spark-first shape: the merge is ONE hash shuffle. Base rows enter
  * the union at `seq = 0` (every real changelog seq is > 0), so
  * "untouched", "updated", "deleted" and "inserted" all fall out of a
  * single `row_number` window per key — no join, no second pass over
  * the snapshot. At 100 TB this beats the join spelling (base ⟕
  * winners) because the snapshot crosses the wire exactly once and the
  * window's per-key state is one row; with the base table bucketed on
  * the key, AQE keeps the changelog side's exchange and the base scan
  * stays shuffle-free. Compaction semantics follow for free: merging a
  * merged snapshot with the NEXT changelog window is the same call, so
  * the operator is its own incremental-maintenance step (idempotent
  * for retried changelog batches — max-seq is a lattice join, the same
  * convergence argument as the index generations, GenTable.scala).
  *
  * Ties on (key, seq) would make the winner order-dependent, so the
  * window tiebreaks on `op` descending ('u' > 'd': a same-seq
  * upsert+delete pair deterministically resolves to the upsert — and
  * the spec pins that callers should give ops distinct seqs). */
object ChangelogMerge {

  val SeqCol = "cl_seq"
  val OpCol = "cl_op"

  /** Apply `changelog` (same schema as `base` plus [[SeqCol]] ≥ 1 and
    * [[OpCol]]) to `base`, returning the merged snapshot (base schema
    * plus the winner's [[SeqCol]] — 0 for untouched rows — which
    * callers use for audit columns and drop for storage). A base that
    * already CARRIES a [[SeqCol]] (a compacted merge-on-read snapshot,
    * [[compact]]) keeps its per-row seqs, so a replayed delta whose seq
    * the fold already absorbed loses to the folded row instead of
    * reverting it. */
  def merge(base: DataFrame, changelog: DataFrame,
      key: Seq[String]): DataFrame = {
    val withSeq = if (base.columns.contains(SeqCol)) base
      else base.withColumn(SeqCol, lit(0L))
    val baseAsLog = if (withSeq.columns.contains(OpCol)) withSeq
      else withSeq.withColumn(OpCol, lit("u"))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(SeqCol).desc, col(OpCol).desc)
    baseAsLog.unionByName(changelog)
      .withColumn("cl_rk", row_number().over(w))
      .where(col("cl_rk") === 1 && col(OpCol) === "u")
      .drop("cl_rk", OpCol)
  }

  // ------------------------------------------------- merge-on-read table
  //
  // The streaming/storage form (Hudi's MOR / Iceberg's merge-on-read
  // shape): a `base/` snapshot plus `delta/gen=N/` changelog appends —
  // one generation per micro-batch, written with dynamic partition
  // overwrite so a RETRIED batch replaces exactly its own generation
  // (the exactly-once-on-storage contract the index families use,
  // GenTable.writePartitioned). Reads merge base + deltas; compaction
  // folds completed generations into a new base that KEEPS the winner
  // seq per row, so replayed or straggling deltas at-or-below the
  // folded seq lose to the fold instead of reverting it. Contract the
  // stream must provide (the CDC reader's usual delivery guarantee):
  // generation order respects seq order — a delta gen is only folded
  // once no LATER gen can carry a SMALLER seq for a tombstoned key
  // (a tombstone's key vanishes from the folded base, so an
  // older-than-tombstone upsert arriving after the fold would
  // resurrect it; with monotone seqs that delta cannot exist).

  /** Write the initial snapshot. `df` may carry [[SeqCol]] or not. */
  def writeBase(df: DataFrame, tablePath: String): Unit =
    df.write.mode("overwrite").parquet(s"$tablePath/base")

  /** Append one changelog generation (idempotent in `gen`: dynamic
    * partition overwrite replaces exactly this generation on retry). */
  def appendDelta(df: DataFrame, tablePath: String, gen: Long): Unit =
    df.withColumn("gen", lit(gen))
      .write.partitionBy("gen")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$tablePath/delta")

  private def readDeltas(spark: SparkSession, tablePath: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$tablePath/delta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // schema-bound: an all-empty generation (or a delta dir whose only
    // gens were folded away) must read as the empty relation, not throw
    spark.read.schema(schema.add("gen", "long")).parquet(p.toString)
      .drop("gen")
  }

  /** The merged view of the table: base + every live delta generation.
    * This IS the read path — O(base + deltas), one shuffle. */
  def readMerged(spark: SparkSession, tablePath: String,
      key: Seq[String]): DataFrame = {
    // self-heal a crash-interrupted compact (base/ renamed aside but
    // base_next/ not yet in place) so reads never see a missing base.
    // RESTORE-only (healRestore, not healSwap): the read path must not
    // delete a racing writer's freshly staged base_next — stale-dir
    // cleanup belongs to compact(), which runs the full healSwap under
    // the single-writer serialization (r14 advice).
    Layout.healRestore(spark, s"$tablePath/base")
    val base = spark.read.parquet(s"$tablePath/base")
    val deltaSchema = org.apache.spark.sql.types.StructType(
      base.schema.filterNot(f => f.name == SeqCol || f.name == OpCol))
      .add(SeqCol, "long").add(OpCol, "string")
    merge(base, readDeltas(spark, tablePath, deltaSchema), key)
  }

  /** Fold every delta generation ≤ `uptoGen` into the base (keeping
    * the winner seq per row), then drop the folded generations. Fold
    * first, delete after: a crash between the two re-applies already-
    * folded deltas onto the folded base — same winners, so the retry
    * converges (max-seq is a lattice join). */
  def compact(spark: SparkSession, tablePath: String, key: Seq[String],
      uptoGen: Long): Unit = {
    Layout.healSwap(spark, s"$tablePath/base_next", s"$tablePath/base")
    val base = spark.read.parquet(s"$tablePath/base")
    val deltaSchema = org.apache.spark.sql.types.StructType(
      base.schema.filterNot(f => f.name == SeqCol || f.name == OpCol))
      .add(SeqCol, "long").add(OpCol, "string")
    val p = new org.apache.hadoop.fs.Path(s"$tablePath/delta")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return
    val live = spark.read.schema(deltaSchema.add("gen", "long"))
      .parquet(p.toString)
    val folded = merge(base, live.where(col("gen") <= uptoGen).drop("gen"),
      key)
    // Stage-then-swap via the shared rename-ASIDE commit (Layout
    // .swapInto after a healSwap at entry, same as PqIndex/IvfIndex
    // compactions): base → base.old, base_next → base, drop .old. Every
    // crash point leaves base/ or base.old/ present, and re-running
    // compact heals and retries — unlike a delete-then-rename, which
    // has a window with NO base at all. The swap window is still not
    // atomic for concurrent readers — single-writer tables
    // (foreachBatch is the only writer here) are safe; a multi-writer
    // deployment puts the same IndexLock writer fence around this that
    // the index families use for their compactions.
    folded.write.mode("overwrite").parquet(s"$tablePath/base_next")
    Layout.swapInto(spark, s"$tablePath/base_next", s"$tablePath/base")
    val st = fs.listStatus(p)
    st.filter { s =>
      val n = s.getPath.getName
      n.startsWith("gen=") &&
        scala.util.Try(n.stripPrefix("gen=").toLong).toOption
          .exists(_ <= uptoGen)
    }.foreach(s => fs.delete(s.getPath, true))
  }
}

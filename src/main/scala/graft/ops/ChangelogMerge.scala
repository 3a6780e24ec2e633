package graft.ops

import org.apache.spark.sql.DataFrame
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
    * callers use for audit columns and drop for storage). */
  def merge(base: DataFrame, changelog: DataFrame,
      key: Seq[String]): DataFrame = {
    val baseAsLog = base
      .withColumn(SeqCol, lit(0L))
      .withColumn(OpCol, lit("u"))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(SeqCol).desc, col(OpCol).desc)
    baseAsLog.unionByName(changelog)
      .withColumn("cl_rk", row_number().over(w))
      .where(col("cl_rk") === 1 && col(OpCol) === "u")
      .drop("cl_rk", OpCol)
  }
}

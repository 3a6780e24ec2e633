package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.GraphIndex
import graft.sources.Tables

/** Persisted graph-ANN index lifecycle (ops/GraphIndex): incremental
  * insert, streaming ingest, takedown + compaction — the same
  * build/probe/append/compact contract the LSH (q62/q92/q101/q106),
  * IVF (q97/q105/q109), PQ (q123/q138) and SimHash (q112) families
  * carry, applied to the NN-Descent/beam-search graph q148 builds and
  * q163 traverses. Every oracle replays the WHOLE lifecycle
  * relationally: the base graph CTE chain (shared with q148Sql), the
  * unrolled beam hops per inserted batch, the forward top-k + capped
  * reverse edges, and — for the compaction — the tombstone drop and
  * the degree re-prune, so a drifted entry vertex, a beam that saw its
  * own batch, an uncapped magnet node or a resurrected takedown all
  * hash-mismatch. */
private[queries] trait ExtGraphQueries extends ExtQueryHelpers {
  // this: ExtAnnQueries supplies nnGraphCtesOver (the q148 CTE chain)
  self: ExtAnnQueries =>

  /** Graph-index geometry — the Scala calls and the generated oracle
    * SQL both read these, so the two cannot drift. */
  private val GraphK = 4      // forward edges per inserted node
  private val GraphBeam = 8   // beam width
  private val GraphHops = 2   // beam hops per search
  private val GraphRevCap = 4 // reverse edges accepted per node per batch
  private val GraphMaxDeg = 8 // out-degree cap (build + offline compact)

  /** Base-graph CTE chain ending in `g0` — NN-Descent over the NON-batch
    * vectors (vec_id % 4 <> 0, the family's base/ingest split),
    * symmetrized and degree-capped exactly like [[GraphIndex.build]]. */
  private def baseGraphCtes: String =
    nnGraphCtesOver("SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb " +
      "FROM embeddings WHERE vec_id % 4 <> 0") + s""",
      |sym AS MATERIALIZED (SELECT src, dst, max(cos) AS cos FROM (
      |    SELECT src, dst, cos FROM e2
      |    UNION ALL SELECT dst, src, cos FROM e2) GROUP BY 1, 2),
      |g0 AS MATERIALIZED (SELECT src, dst, cos FROM (
      |    SELECT *, row_number() OVER (PARTITION BY src
      |      ORDER BY cos DESC, dst) AS rn FROM sym) WHERE rn <= $GraphMaxDeg)""".stripMargin

  /** Unrolled beam-search CTEs `<pfx>b0..<pfx>b<hops>` for probes `p`
    * (probe_id, pv) over adjacency `adj` (src, dst), scoring against
    * nodes `nd` (vec_id, emb), entering at `ent` (v) — the relational
    * replay of [[GraphIndex.beamSearch]]'s expand-score-prune loop. */
  private def beamChain(pfx: String, p: String, adj: String, nd: String,
      ent: String): String = {
    val b0 =
      s"""${pfx}b0 AS MATERIALIZED (SELECT $p.probe_id, $ent.v,
         |    list_cosine_similarity(ev.emb, $p.pv) AS cos
         |  FROM $p CROSS JOIN $ent JOIN $nd ev ON ev.vec_id = $ent.v)""".stripMargin
    val rounds = (1 to GraphHops).map { r =>
      val prev = s"${pfx}b${r - 1}"
      s"""${pfx}bc$r AS MATERIALIZED (SELECT DISTINCT probe_id, v FROM (
         |    SELECT probe_id, v FROM $prev
         |    UNION ALL
         |    SELECT $prev.probe_id, a.dst AS v
         |    FROM $prev JOIN $adj a ON a.src = $prev.v)),
         |${pfx}bs$r AS MATERIALIZED (SELECT ${pfx}bc$r.probe_id, ${pfx}bc$r.v,
         |    list_cosine_similarity(ev.emb, pp.pv) AS cos
         |  FROM ${pfx}bc$r JOIN $nd ev ON ev.vec_id = ${pfx}bc$r.v
         |       JOIN $p pp ON pp.probe_id = ${pfx}bc$r.probe_id),
         |${pfx}b$r AS MATERIALIZED (SELECT probe_id, v, cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos DESC, v) AS rn FROM ${pfx}bs$r) WHERE rn <= $GraphBeam)""".stripMargin
    }.mkString(",\n")
    s"$b0,\n$rounds"
  }

  /** `<pfx>fwd` (probe top-k as src→dst edges, rn kept for the log
    * shape) and `<pfx>rev` (dst→src back-edges, capped at GraphRevCap
    * per receiving node — the window runs over the PRE-alias columns,
    * i.e. partitions by the old neighbor and breaks ties on the new
    * id, exactly [[GraphIndex.probeAndAppend]]'s wRev). */
  private def insertCtes(pfx: String): String =
    s"""${pfx}fwd AS MATERIALIZED (SELECT probe_id AS src, v AS dst, cos, rn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, v) AS rn
       |    FROM ${pfx}b$GraphHops WHERE v <> probe_id) WHERE rn <= $GraphK),
       |${pfx}rev AS MATERIALIZED (SELECT src, dst, cos FROM (
       |    SELECT dst AS src, src AS dst, cos,
       |      row_number() OVER (PARTITION BY dst ORDER BY cos DESC, src) AS rn
       |    FROM ${pfx}fwd) WHERE rn <= $GraphRevCap)""".stripMargin

  // ----------------------------------------------------------------- q165
  /** INCREMENTAL graph-index ingest — q97's contract for the graph
    * family: the index is PERSISTED (gen=base nodes + degree-capped
    * directed adjacency from [[GraphIndex.build]]), an ingest batch
    * (vec_id % 4 == 0) beam-searches the PRE-batch graph for each new
    * vector's top-4 neighbors and APPENDS as `gen=b0` — forward edges
    * plus reverse edges capped at 4 per receiving node (the Vamana/HNSW
    * insertion discipline: a magnet node's degree grows ≤ revCap per
    * batch, never unboundedly). The query emits the APPENDED GENERATION
    * itself read back from storage, each edge tagged fwd/rev, so the
    * beam search, the top-k selection, the reverse capping AND the
    * persisted write all sit under one hash. Scale shape: beams are
    * |batch|·beamW rows by construction and settle driver-local; each
    * hop is a `src IN (frontier)` edge scan + a `vec_id IN (cands)`
    * node scan, both pushed and row-group-pruned by the clustered
    * layout — per-probe cost O(hops·beam·maxDeg), independent of
    * corpus size (GraphIndex scaladoc; PlanAudit sweeps the plan). */
  private[queries] def q165(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.ops.Scratch.tempDir("graft_q165_")
    try {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val isBatch = pmod(col("vec_id"), lit(4)) === 0
      val path = s"$tmp/g"
      GraphFixtures.baseIndexInto(spark, dir, path, GraphK, GraphMaxDeg)
      GraphIndex.probeAndAppend(spark, path, emb.where(isBatch),
        batchId = Some(0L), k = GraphK, beamW = GraphBeam,
        hops = GraphHops, revCap = GraphRevCap)
      val appended = spark.read.parquet(GraphIndex.edgesPath(path))
        .where(col("gen") === "b0")
        .select(
          when(pmod(col("src"), lit(4)) === 0, lit("fwd"))
            .otherwise(lit("rev")).as("kind"),
          col("src"), col("dst"), round(col("cos"), 4).as("cos_sim"))
      localizeRows(appended, Seq("kind", "src", "dst"))
    } finally rmRecursive(tmp)
  }
  private[queries] lazy val q165Sql =
    s"""WITH $baseGraphCtes,
       |p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
       |      FROM embeddings WHERE vec_id % 4 = 0),
       |nd0 AS MATERIALIZED (SELECT vec_id, emb FROM e),
       |ent AS (SELECT min(vec_id) AS v FROM e),
       |${beamChain("i", "p", "g0", "nd0", "ent")},
       |${insertCtes("i")}
       |SELECT CASE WHEN src % 4 = 0 THEN 'fwd' ELSE 'rev' END AS kind,
       |       src, dst, round(cos, 4) AS cos_sim
       |FROM (SELECT src, dst, cos FROM ifwd
       |      UNION ALL SELECT src, dst, cos FROM irev)
       |ORDER BY kind, src, dst""".stripMargin

  // ----------------------------------------------------------------- q166
  /** STREAMING graph-index ingest through the PRODUCTION operator
    * (`StreamingPipeline.startGraphIngest`: foreachBatch →
    * [[GraphIndex.probeAndAppendToLog]]) — q105's contract for the
    * graph family: embeddings arrive in 2 micro-batches, each batch
    * beam-searches the graph as built from the base generation PLUS
    * every EARLIER batch (own generation excluded — the retry
    * contract), logs its per-vector top-4 to the batch_id-partitioned
    * ANN log, and appends itself (forward + capped reverse edges) for
    * the next batch to traverse. The oracle replays the whole history:
    * the deterministic vec_id-order 2-chunk batching, per-batch graph
    * visibility (batch 1 searches g0 ∪ batch 0's edges and scores
    * against base ∪ batch 0 nodes), beam hops, caps. The stream's
    * state store is EMPTY — the graph on storage IS the state, so the
    * ingest restarts and scales horizontally like the other index
    * ingests. */
  private[queries] def q166(spark: SparkSession, dir: String): DataFrame =
    streamGraphIngest(spark, dir, compactEvery = None, prefix = "graft_q166_")

  /** The shared q166/q172 harness (the streamLshIngest pattern): base
    * graph built, the vec_id%4==0 stream fed in 2 id-ordered
    * micro-batches through the PRODUCTION `startGraphIngest` (with or
    * without in-stream auto-compaction), ANN log localized before the
    * scratch dir dies. */
  private def streamGraphIngest(spark: SparkSession, dir: String,
      compactEvery: Option[Int], prefix: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = graft.ops.Scratch.tempDir(prefix)
    try {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val isStream = pmod(col("vec_id"), lit(4)) === 0
      val path = s"$tmp/g"
      GraphFixtures.baseIndexInto(spark, dir, path, GraphK, GraphMaxDeg)
      val rows = fixtureSlice(emb.where(isStream).as[(Long, Seq[Float])])
        .sortBy(_._1)
      val per = math.max(1, math.ceil(rows.length / 2.0).toInt)
      val chunks = rows.grouped(per).toArray
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = graft.streaming.StreamingPipeline.startGraphIngest(
        mem.toDF().toDF("vec_id", "embedding"),
        indexPath = path, annDir = s"$tmp/ann", checkpointDir = s"$tmp/ckpt",
        k = GraphK, beamW = GraphBeam, hops = GraphHops, revCap = GraphRevCap,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
        compactEvery = compactEvery)
      try chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      finally q.stop()
      localizeRows(
        spark.read.schema(
            "probe_id BIGINT, rn INT, neighbor_id BIGINT, cos_sim DOUBLE, batch_id BIGINT")
          .parquet(s"$tmp/ann")
          .select(col("probe_id"), col("rn"), col("neighbor_id"), col("cos_sim")),
        Seq("probe_id", "rn"))
    } finally rmRecursive(tmp)
  }

  // ----------------------------------------------------------------- q172
  /** q166's streaming graph ingest WITH in-stream auto-compaction on
    * the correctness gate — q106's contract for the graph family:
    * `compactEvery = 1` fires the lag-1 compaction inside foreachBatch
    * after EVERY batch (generations fold VERBATIM — no degree re-prune —
    * while the firing batch's own generation stays replace-able), so
    * batch 1's beam search traverses the POST-fold adjacency (folded
    * base ∪ kept b0) — the fold sits upstream of a gated probe, not
    * after the last one. The oracle is q166's from-scratch replay,
    * identical: the hash only matches if folding generations mid-stream
    * changed NOTHING about which neighbors every batch finds — with
    * cadence 1 that invariant is LIVE end-to-end under the driver's
    * gate (the r15 cadence-2 form only ever folded after the final
    * probe; GraphIndexSpec pinned the set-equality, nothing exercised
    * it in-stream). */
  private[queries] def q172(spark: SparkSession, dir: String): DataFrame =
    streamGraphIngest(spark, dir, compactEvery = Some(1), prefix = "graft_q172_")
  private[queries] lazy val q166Sql =
    s"""WITH $baseGraphCtes,
       |s AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        (row_number() OVER (ORDER BY vec_id) - 1)
       |          // CAST(ceil(count(*) OVER () / 2.0) AS BIGINT) AS b
       |      FROM embeddings WHERE vec_id % 4 = 0),
       |pb0 AS (SELECT vec_id AS probe_id, v AS pv FROM s WHERE b = 0),
       |pb1 AS (SELECT vec_id AS probe_id, v AS pv FROM s WHERE b = 1),
       |nd0 AS MATERIALIZED (SELECT vec_id, emb FROM e),
       |ent0 AS (SELECT min(vec_id) AS v FROM nd0),
       |${beamChain("x", "pb0", "g0", "nd0", "ent0")},
       |${insertCtes("x")},
       |g1 AS MATERIALIZED (SELECT src, dst, cos FROM g0
       |       UNION ALL SELECT src, dst, cos FROM xfwd
       |       UNION ALL SELECT src, dst, cos FROM xrev),
       |nd1 AS MATERIALIZED (SELECT vec_id, emb FROM nd0
       |        UNION ALL SELECT vec_id, v AS emb FROM s WHERE b = 0),
       |ent1 AS (SELECT min(vec_id) AS v FROM nd1),
       |${beamChain("y", "pb1", "g1", "nd1", "ent1")},
       |${insertCtes("y")}
       |SELECT src AS probe_id, rn, dst AS neighbor_id,
       |       round(cos, 4) AS cos_sim
       |FROM (SELECT src, dst, cos, rn FROM xfwd
       |      UNION ALL SELECT src, dst, cos, rn FROM yfwd)
       |ORDER BY probe_id, rn""".stripMargin

  // ----------------------------------------------------------------- q167
  /** Graph-index TAKEDOWN + COMPACTION — q101/q109's contract for the
    * graph family: after the base build and one incremental batch,
    * five vectors (two base, three batch) are tombstoned
    * ([[GraphIndex.markDeleted]] — O(deletions), nothing rebuilt) and
    * an OFFLINE [[GraphIndex.compact]] folds the generations into one
    * tight gen=base: tombstoned nodes drop physically WITH every edge
    * touching them on either endpoint, and the merged adjacency
    * RE-PRUNES to maxDeg per node — absorbing the reverse-edge growth
    * the per-batch cap admitted, the Vamana long-run degree invariant.
    * Output is the compacted adjacency for src < 40, rank-numbered; the
    * oracle replays insert → tombstone-drop → re-prune and
    * hash-matches. */
  private[queries] def q167(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.ops.Scratch.tempDir("graft_q167_")
    try {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val isBatch = pmod(col("vec_id"), lit(4)) === 0
      val path = s"$tmp/g"
      GraphFixtures.baseIndexInto(spark, dir, path, GraphK, GraphMaxDeg)
      GraphIndex.probeAndAppend(spark, path, emb.where(isBatch),
        batchId = Some(0L), k = GraphK, beamW = GraphBeam,
        hops = GraphHops, revCap = GraphRevCap)
      GraphIndex.markDeleted(spark, path, Seq(1L, 2L, 0L, 4L, 8L))
      GraphIndex.compact(spark, path, maxDeg = GraphMaxDeg)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
      val out = spark.read.parquet(GraphIndex.edgesPath(path))
        .where(col("src") < 40)
        .select(col("src"), row_number().over(w).as("rn"),
          col("dst"), round(col("cos"), 4).as("cos_sim"))
      localizeRows(out, Seq("src", "rn"))
    } finally rmRecursive(tmp)
  }
  private[queries] lazy val q167Sql =
    s"""WITH $baseGraphCtes,
       |p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
       |      FROM embeddings WHERE vec_id % 4 = 0),
       |nd0 AS MATERIALIZED (SELECT vec_id, emb FROM e),
       |ent AS (SELECT min(vec_id) AS v FROM e),
       |${beamChain("i", "p", "g0", "nd0", "ent")},
       |${insertCtes("i")},
       |tomb AS (SELECT unnest([0, 1, 2, 4, 8]) AS t),
       |merged AS (SELECT src, dst, cos FROM (
       |    SELECT src, dst, cos FROM g0
       |    UNION ALL SELECT src, dst, cos FROM ifwd
       |    UNION ALL SELECT src, dst, cos FROM irev)
       |  WHERE src NOT IN (SELECT t FROM tomb)
       |    AND dst NOT IN (SELECT t FROM tomb)),
       |pruned AS (SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM merged)
       |SELECT src, rn, dst, round(cos, 4) AS cos_sim
       |FROM pruned WHERE rn <= $GraphMaxDeg AND src < 40
       |ORDER BY src, rn""".stripMargin
}

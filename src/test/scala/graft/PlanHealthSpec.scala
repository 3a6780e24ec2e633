package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.queries.Queries

/** Pins the flagship plan-shape claims by CI (the human-readable version
  * lives in COVERAGE.md's PlanAudit appendix): a broadcast that silently
  * becomes a sort-merge join, or a filter that stops reaching the parquet
  * scan, is a perf regression at 100 TB long before it is a correctness
  * problem at sf0.001. */
class PlanHealthSpec extends SparkSpecBase {

  private def executedPlan(name: String): String = {
    val fn = Queries.all.find(_.name == name).get.fn
    val exec = fn(spark, sf0001).queryExecution.executedPlan
    exec.executeCollect() // finalize the adaptive plan
    exec.toString.split("== Initial Plan ==")(0)
  }

  test("q01: value/event_type predicates are pushed down to the scan") {
    val plan = executedPlan("q01_schema_bound_scan")
    assert(plan.contains("PushedFilters: ["),
      s"no pushed filters in:\n$plan")
    assert(plan.contains("GreaterThan(value,100.0)"),
      "the value > 100 predicate must reach the parquet reader")
  }

  test("q09: the customer dim joins as a broadcast, never sort-merge") {
    val plan = executedPlan("q09_join_enrich")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "dim join must not degrade to a shuffle join")
  }

  test("q23: brute-force kNN broadcasts the probes; the corpus side " +
    "never shuffles for the join") {
    val plan = executedPlan("q23_knn_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"probes not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "corpus must not shuffle or cartesian for the probe join")
  }

  test("q29: metadata projection never reads the blob column") {
    val plan = executedPlan("q29_multimodal_meta")
    // the multimodal table scan must prune `blob` out of ReadSchema
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    assert(!readSchemas.exists(_.contains("blob")),
      s"blob column not pruned: $readSchemas")
  }

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec        => fileScans(q.plan)
    case s: FileSourceScanExec    => Seq(s)
    case other                    => other.children.flatMap(fileScans)
  }

  /** The five tests above pin flagship plans in detail; this sweeps the
    * WHOLE declared registry so a regression in any of the other queries
    * (a join collapsing to a cartesian, a probe losing its broadcast, a
    * filter detaching from its parquet scan) fails CI instead of landing
    * silently. Executes every query at sf0.001 — cheap, and execution is
    * required anyway to finalize the adaptive plan. */
  test("registry sweep: no CartesianProduct; BroadcastNestedLoopJoin only " +
    "in the declared broadcast probes; no scan that drops its pushable " +
    "filters") {
    // queries that broadcast a tiny probe/scalar frame against the corpus
    // by design: kNN probes (q23/q54, the 5 media probes of q99/q111,
    // q123's 5 PQ probes), the q15 cosine probe row, q38's 1-row corpus
    // count, q74's 1-row (n_tot, w_tot) mixture totals, q93's 1-row
    // learned merge pair, q122's 1-row LM normalization constants,
    // q130's 1-row (N, avgdl) BM25 corpus stats, q148's 1-row corpus
    // count (init-ring modulus) + 50-probe exact-truth audit, q163's
    // 1-row entry vertex + 30-probe exact-truth audit (the same two
    // bounded broadcasts as q148, reused through nnDescentGraph),
    // q168's 20-probe Matryoshka shortlist + exact-truth audit
    val bnljOk = Set("q23_knn_bruteforce", "q54_ann_ivf",
      "q148_nn_descent", "q163_graph_ann_beam",
      "q168_matryoshka_rerank",
      "q151_kll_quantiles", "q152_hard_negative_mining",
      "q65_ann_ivf_persisted", "q15_cosine_topk", "q38_tfidf_topk",
      "q74_mixture_sampling", "q93_bpe_apply_merge",
      "q97_ann_ivf_incremental", "q98_temperature_upsampling",
      "q99_media_embed_ann", "q111_video_frame_embed_ann",
      "q122_bigram_lm_backoff", "q123_pq_adc_ann", "q124_ivfpq_ann",
      "q125_pq_recall_audit", "q126_pq_rerank_ann", "q130_bm25_topk",
      "q186_phrase_bm25") // q130's 1-row corpus-stats broadcast cross join
    // Only flag a scan as "lost pushdown" when it carries a filter that
    // parquet could certainly take (attribute-vs-literal / isnotnull on a
    // bare attribute); expression filters (bloom probes, shingle sizes)
    // legitimately stay scan-side without translating.
    import org.apache.spark.sql.catalyst.expressions.{
      Attribute, BinaryComparison, Expression, In, IsNotNull, Literal}
    def clearlyPushable(e: Expression): Boolean = e match {
      case IsNotNull(_: Attribute) => true
      case b: BinaryComparison => (b.left, b.right) match {
        case (_: Attribute, _: Literal) | (_: Literal, _: Attribute) => true
        case _ => false
      }
      case In(_: Attribute, vs) => vs.forall(_.isInstanceOf[Literal])
      case _ => false
    }
    val failures = Queries.all.flatMap { d =>
      val exec = d.fn(spark, sf0001).queryExecution.executedPlan
      exec.executeCollect()
      val plan = exec.toString.split("== Initial Plan ==")(0)
      val lost = fileScans(exec).filter(s =>
        s.metadata.get("PushedFilters").contains("[]") &&
          s.dataFilters.exists(clearlyPushable))
      Seq(
        Option.when(plan.contains("CartesianProduct"))(
          s"${d.name}: CartesianProduct"),
        Option.when(plan.contains("BroadcastNestedLoopJoin") && !bnljOk(d.name))(
          s"${d.name}: BroadcastNestedLoopJoin"),
        Option.when(lost.nonEmpty)(
          s"${d.name}: scan with dataFilters but PushedFilters [] — " +
            lost.map(_.dataFilters.mkString(",")).mkString("; "))
      ).flatten
    }
    assert(failures.isEmpty, s"plan-health regressions:\n${failures.mkString("\n")}")
  }

  test("q60: the Space-Saving aggregate combines map-side (partial + " +
    "final ObjectHashAggregate, no all-rows shuffle to one stage)") {
    val plan = executedPlan("q60_heavy_hitters")
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_space_saving_topk") ||
      "partial_".r.findAllIn(plan).nonEmpty,
      s"no partial aggregation phase in:\n$plan")
  }
}

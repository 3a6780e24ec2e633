package graft

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

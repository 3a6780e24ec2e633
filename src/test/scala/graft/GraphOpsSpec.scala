package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Force the DISTRIBUTED large-star/small-star loop (threshold 0). */
  private def distributed(edges: Seq[(Long, Long)],
      maxRounds: Int = 25): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"),
      maxRounds = maxRounds, localThreshold = 0)
      .as[(Long, Long)].collect().toMap

  /** The default adaptive entry point (local input -> union-find). */
  private def adaptive(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  /** Reference union-find for the oracle side of the property test. */
  private def unionFindRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap { ns => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("distributed path: a path graph collapses to its minimum node") {
    val got = distributed(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("distributed path: disjoint components keep separate minimal " +
    "labels; self-loops and duplicate/reversed edges are tolerated") {
    val got = distributed(Seq(
      (10L, 11L), (11L, 10L), (11L, 11L), (10L, 11L), // one component, messy input
      (3L, 7L), (7L, 5L),                             // second component
      (20L, 21L)))                                    // third
    assert(got == Map(10L -> 10L, 11L -> 10L,
      3L -> 3L, 7L -> 3L, 5L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("distributed and adaptive-local paths agree with a union-find " +
    "reference on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter(e => e._1 != e._2)
      val want = unionFindRef(edges)
      assert(adaptive(edges) == want, s"local path, trial $trial")
      if (trial == 1) assert(distributed(edges) == want, s"dist path, trial $trial")
    }
  }

  test("local fast path engages for LocalRelation input (no Spark jobs " +
    "for the fixpoint), and a wide input falls back to the loop") {
    // LocalRelation input: result plan is itself local (no shuffles ran)
    val local = GraphOps.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    assert(local.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    // A non-local (aggregated) edge source cannot take the fast path;
    // it must still produce the right components via the loop.
    val viaAgg = Seq((1L, 2L), (1L, 2L), (2L, 3L))
      .toDF("src", "dst").repartition(3)
      .groupBy($"src", $"dst").agg(count(lit(1))).select($"src", $"dst")
    val got = GraphOps.connectedComponents(viaAgg).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a self-loop-ONLY node is omitted by BOTH paths (normalize drops " +
    "self-loops; the local union-find matches)") {
    // Node 9 appears only in (9,9); nodes 1-2 form a real component.
    val edges = Seq((9L, 9L), (1L, 2L))
    val want = Map(1L -> 1L, 2L -> 1L)
    assert(adaptive(edges) == want, "local path must omit the self-loop-only node")
    assert(distributed(edges) == want, "distributed path must omit it too")
    // Degenerate input: nothing but self-loops -> empty result, both paths.
    assert(adaptive(Seq((4L, 4L))) == Map.empty[Long, Long])
    assert(distributed(Seq((4L, 4L))) == Map.empty[Long, Long])
  }

  test("a long chain converges within the O(log n) round budget " +
    "(the star-contraction property, not diameter-many rounds)") {
    val chain = (0L until 256L).sliding(2).map(s => (s(0), s(1))).toSeq
    // maxRounds 12 << 255 (the diameter): only log-round convergence passes
    val got = distributed(chain, maxRounds = 12)
    assert(got.size == 256 && got.values.forall(_ == 0L))
  }
}

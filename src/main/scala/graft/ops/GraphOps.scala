package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step a
  * production dedup pipeline runs AFTER pairwise near-dup detection:
  * LSH + verification emits PAIRS (q20), but "keep one copy per
  * duplicate group" needs the transitive closure of those pairs, with a
  * canonical representative per group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed on
  * DataFrames. Both steps are a groupBy-min plus a join back on the
  * grouping key — bounded per-node state (no `collect_set` of whole
  * neighborhoods, which a hub node would blow up), each round a fixed
  * number of keyed shuffles, and convergence in O(log n) rounds to the
  * star graph rooted at each component's minimum node id.
  *
  * The driver loop per round collects exactly TWO scalars (edge count +
  * order-independent checksum) to test the fixpoint — control flow, not
  * data flow; the edge sets themselves never leave the cluster. Each
  * round's edge set is materialized with an EAGER localCheckpoint: a
  * plain persist() caches the data but leaves the round's full logical
  * plan in place, so Catalyst re-analyzes a tree that DOUBLES per round
  * — the iterative-algorithm lineage explosion (planning time goes
  * exponential long before data size matters). localCheckpoint re-roots
  * the plan at the materialized RDD, keeping per-round planning O(1);
  * superseded round RDDs are dropped by the context cleaner once
  * unreferenced. A production run on a fault-intolerant cluster would
  * use reliable `checkpoint()` to durable storage instead — same loop,
  * same truncation, recoverable blocks.
  */
object GraphOps {

  /** Connected components of the undirected graph given by `edges`
    * (columns `src`, `dst`; self-loops and duplicates tolerated).
    * Returns (`node`, `component`) for every node incident to an edge,
    * where `component` is the smallest node id in the node's component.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    var cur = normalize(edges).localCheckpoint(true)
    var stats: (Long, String) = checksum(cur)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nextStats = checksum(next)
      cur = next
      converged = nextStats == stats
      stats = nextStats
      rounds += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // Fixpoint edges form stars (node -> component min). Roots appear
    // only on the dst side; give each its own (root, root) row.
    val assign = cur.select(col("src").as("node"), col("dst").as("component"))
      .union(cur.select(col("dst").as("node"), col("dst").as("component")))
      .distinct()
    // Localize the (small) assignment table so the caller holds a plain
    // local result rather than a plan pinned to round RDDs (q20's
    // localize-or-persist pattern; the fallback keeps a self-owned
    // cache).
    Caches.localize(assign, maxRows = 1 << 22).getOrElse {
      val p = assign.persist(); p.count(); p
    }
  }

  /** Undirected edge set as a canonical directed form (src < dst),
    * deduplicated, self-loops dropped. */
  private def normalize(e: DataFrame): DataFrame =
    e.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .where(col("src") < col("dst"))
      .distinct()

  /** Both directions of every edge, no self-loops. */
  private def bidir(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))

  /** Large-star: every node links its strictly-LARGER neighbors to the
    * minimum of its closed neighborhood. One groupBy-min + one join on
    * the same key (the aggregate is map-side combinable; the join keys
    * share the aggregate's hash partitioning, so AQE plans the join
    * without a second full shuffle of the big side). */
  private def largeStar(e: DataFrame): DataFrame = {
    val b = bidir(e)
    val mins = b.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    b.join(mins, "src")
      .where(col("dst") > col("src") && col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: every node links its not-larger neighbors AND itself to
    * the minimum among them. Same two-shuffle shape as largeStar. */
  private def smallStar(e: DataFrame): DataFrame = {
    val down = bidir(e).where(col("dst") < col("src"))
    val mins = down.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val withM = down.join(mins, "src")
    withM.select(col("dst").as("src"), col("m").as("dst"))
      .union(mins.select(col("src"), col("m").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Order-independent fingerprint of a distinct edge set: (count,
    * sum of per-edge hashes). Equal fingerprints across rounds ⇒ equal
    * sets (w.h.p.), which is the fixpoint test. The sum rides
    * decimal(38,0) — a LongType sum of full-range hashes overflows
    * under ANSI arithmetic. */
  private def checksum(e: DataFrame): (Long, String) = {
    val row = e.agg(count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)).as("h")).head()
    (row.getLong(0), String.valueOf(row.get(1)))
  }
}

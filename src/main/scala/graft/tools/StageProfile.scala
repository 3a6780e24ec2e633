package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway-style phase profiler for one registry query's building
  * blocks — times each named stage with `count()` actions so a slow
  * declared query can be attributed to a phase instead of guessed at.
  * Usage: `runMain graft.tools.StageProfile <sfDir> <what>`. Kept in
  * tools/ (not wired into any gate) because per-phase attribution at
  * the sf1 decade point recurs every round. */
object StageProfile {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val what = if (args.length > 1) args(1) else "q158"
    val spark = SparkSession.builder()
      .appName("graft-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try what match {
      case "q158" => profileQ158(spark, dir)
      case "pairs" => profilePairs(spark, dir)
      case other => sys.error(s"unknown profile target $other")
    } finally spark.stop()
  }

  /** nearDupPairs' phases (the shared floor under q20/q59/q133/q158):
    * signature build, banding, candidate generation, jaccard verify. */
  private def profilePairs(spark: SparkSession, dir: String): Unit = {
    import graft.ops.TextOps
    import graft.functions.MinHashSignature
    val K = 8; val R = 2
    val sigArr = MinHashSignature.minhashSig(spark, col("sh"), K)
    val sig = graft.sources.Tables.spread(
        graft.sources.Tables.documents(spark, dir)
          .select(col("doc_id"), TextOps.shingleSet(col("text"), 2).as("sh")))
      .select(col("doc_id") +: col("sh") +:
        (0 until K).map(i => element_at(sigArr, i + 1).as(s"m$i")): _*)
      .persist()
    time("sig build (shingles + 8 minhash)")(sig.count())
    val bands = TextOps.lshBands(sig, "doc_id", K, R)
    time("bands")(bands.count())
    val cand = TextOps.lshCandidatePairs(bands, "doc_id",
      maxBucket = Some(TextOps.DefaultMaxBucket)).persist()
    time("candidate pairs")(println(s"[profile]   cand = ${cand.count()}"))
    val withSets = sig.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
      .join(broadcast(cand), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
    val j = TextOps.jaccardFromSets(col("sa"), col("sb"))
    val pairs = withSets.where(j >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    time("jaccard verify + sort")(println(s"[profile]   pairs = ${pairs.count()}"))
    time("localize")(graft.ops.Caches.localize(pairs, 1 << 20).map(_ => ()))
    sig.unpersist(); cand.unpersist(); ()
  }

  /** q158's phases, run stepwise with materialization between. */
  private def profileQ158(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val pairs = time("nearDupPairs") {
      val p = graft.queries.ExtQueries.profileNearDupPairs(spark, dir)
      println(s"[profile]   pairs rows = ${p.count()}")
      p
    }
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .persist()
    time("edges repartition+persist")(edges.count())
    time("edges recount (cached)")(edges.count())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    val n = time("deg + count")(deg.count())
    println(s"[profile]   vertices = $n, edges = ${2 * pairs.count()}")
    val mk = md5(concat(col("src").cast("string"), lit("|"),
      col("dst").cast("string")))
    val wLocal = Window.partitionBy(col("src"), col("salt"))
      .orderBy(col("mk"), col("dst"))
    val wGlobal = Window.partitionBy(col("src")).orderBy(col("mk"), col("dst"))
    val capped = edges.withColumn("mk", mk)
      .withColumn("salt", pmod(xxhash64(col("dst")), lit(64L)))
      .withColumn("lrn", row_number().over(wLocal))
      .where(col("lrn") <= 8)
      .withColumn("rn", row_number().over(wGlobal))
      .where(col("rn") <= 8)
      .select(col("src"), col("dst"))
      .persist()
    time("cap (two-phase windows)")(capped.count())
    val cdeg = capped.groupBy(col("src")).agg(count(lit(1)).as("cdeg")).persist()
    time("cdeg")(cdeg.count())
    val edgesDeg = capped.join(cdeg, "src")
    val verts = deg.select(col("src").as("doc_id"))
    var ranks = verts.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to 3) {
      val contrib = edgesDeg.join(ranks, edgesDeg("src") === ranks("doc_id"))
        .select(col("dst"), (col("pr") / col("cdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = verts.join(contrib, verts("doc_id") === contrib("dst"), "left")
        .select(verts("doc_id"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
        .persist()
      time(s"iteration $i (settled)")(next.count())
      ranks.unpersist()
      ranks = next
    }
    val out = ranks.join(deg, ranks("doc_id") === deg("src"))
      .join(cdeg, ranks("doc_id") === cdeg("src"))
      .select(col("doc_id"), col("deg").as("degree"),
        col("cdeg").as("capped_degree"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("doc_id"))
    time("final joins + sort")(out.count())
  }
}

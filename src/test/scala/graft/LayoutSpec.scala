package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout
import graft.sources.Tables

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** (min, max) of the INT64 column `colName` per row group across all
    * parquet files under `dir`, straight from the footers — the same
    * stats a scan's row-group pruning consults. */
  private def int64Stats(dir: String, colName: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
    files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == colName).get
          val s = c.getStatistics
          (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
      } finally r.close()
    }
  }

  test("clusteredWrite yields pairwise-disjoint per-row-group key ranges " +
    "(the min/max stats a pushed range filter prunes on), where the " +
    "hash-shuffled write yields all-overlapping ranges") {
    val events = Tables.events(spark, sf0001).select($"event_id", $"user_id")

    val clustered = tmpDir("layout_clustered")
    Layout.clusteredWrite(events, clustered, files = 4, $"user_id")
    val cs = int64Stats(clustered, "user_id").sortBy(_._1)
    assert(cs.size >= 4, s"expected >=4 row groups, got ${cs.size}")
    cs.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin,
          s"clustered ranges must be disjoint: ($aMax) overlaps ($bMin)")
      case _ =>
    }

    // Control: the same data through a hash repartition — every file
    // spans (nearly) the whole key domain, so min/max stats prune nothing.
    val hashed = tmpDir("layout_hashed")
    events.repartition(4, $"user_id").write.mode("overwrite").parquet(hashed)
    val hs = int64Stats(hashed, "user_id").sortBy(_._1)
    val overlaps = hs.sliding(2).count {
      case Seq((_, aMax), (bMin, _)) => bMin < aMax
      case _ => false
    }
    assert(overlaps > 0,
      s"hash layout control should produce overlapping ranges, got $hs")

    // And the range predicate is pushed to the clustered scan, so the
    // disjoint stats are actually consulted at read time.
    val scan = spark.read.parquet(clustered)
      .where($"user_id" >= 100L && $"user_id" <= 110L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(user_id,100)"),
      s"range filter not pushed:\n$plan")
    // correctness unchanged by layout
    assert(scan.count() ===
      events.where($"user_id".between(100L, 110L)).count())
  }

  test("compact folds an append-grown clustered layout back to `files` " +
    "globally-disjoint files with identical content") {
    val events = Tables.events(spark, sf0001).select($"event_id", $"user_id")
    val dir = tmpDir("layout_compact")
    // base write + three ingest appends: each generation is internally
    // disjoint, but generations overlap each other
    Layout.clusteredWrite(events.where($"event_id" % 4 =!= 0), dir, files = 4, $"user_id")
    (1L to 3L).foreach { g =>
      Layout.clusteredWrite(events.where($"event_id" % 4 === 0 && $"event_id" % 3 === g % 3),
        dir, files = 2, "append", $"user_id")
    }
    def files(d: String) = new java.io.File(d).listFiles()
      .count(f => f.getName.endsWith(".parquet") && f.length > 0)
    assert(files(dir) > 4, s"appends added no files (${files(dir)})")
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq
    Layout.compact(spark, dir, files = 4, $"user_id")
    assert(files(dir) === 4, s"compact left ${files(dir)} files, expected 4")
    // content identical, and the compacted layout is one tight generation:
    // per-row-group user_id ranges are pairwise disjoint again
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq === before)
    val cs = int64Stats(dir, "user_id").sortBy(_._1)
    cs.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"compacted ranges overlap: ($aMax) vs ($bMin)")
      case _ =>
    }
  }

  test("swapInto is crash-recoverable: every half-committed state heals " +
    "and 're-run compact' is a true recovery instruction") {
    val events = Tables.events(spark, sf0001).select($"event_id", $"user_id")
    val dir = tmpDir("layout_heal")
    Layout.clusteredWrite(events, dir, files = 2, $"user_id")
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq
    def mv(a: String, b: String) =
      assert(new java.io.File(a).renameTo(new java.io.File(b)))
    // crash point 1: target renamed aside, staged not yet in place
    // (the one state where the data is "apparently lost")
    mv(dir, s"$dir.old")
    Layout.compact(spark, dir, files = 2, $"user_id") // re-run heals + compacts
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq === before)
    // crash point 2: stale staged + stale .old next to an intact target
    Layout.clusteredWrite(events.limit(5), s"$dir.compacting", files = 1, $"user_id")
    Layout.clusteredWrite(events.limit(7), s"$dir.old", files = 1, $"user_id")
    Layout.compact(spark, dir, files = 2, $"user_id") // drops the strays
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().sorted.toSeq === before)
    assert(!new java.io.File(s"$dir.compacting").exists)
    assert(!new java.io.File(s"$dir.old").exists)
  }

  /** Fraction of row groups whose [min,max] on `colName` overlaps
    * [lo, hi] — the fraction a pushed range predicate must read. */
  private def overlapFrac(dir: String, colName: String, lo: Long, hi: Long): Double = {
    val stats = int64Stats(dir, colName)
    stats.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / stats.size
  }

  test("zorderWrite prunes row groups on EITHER clustering column, where " +
    "single-column clusteredWrite serves one column and scatters the other") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"event_id", $"user_id")

    val zdir = tmpDir("layout_zorder")
    Layout.zorderWrite(events, zdir, files = 16, Seq("user_id", "event_id"))

    val single = tmpDir("layout_single")
    Layout.clusteredWrite(events, single, files = 16, $"user_id")

    // narrow ranges (~2% of each domain) probed against the footer stats
    val Seq(uLo, uHi) = Seq(100L, 110L)
    val (eLo, eHi) = (1000L, 1200L)

    val zU = overlapFrac(zdir, "user_id", uLo, uHi)
    val zE = overlapFrac(zdir, "event_id", eLo, eHi)
    val sU = overlapFrac(single, "user_id", uLo, uHi)
    val sE = overlapFrac(single, "event_id", eLo, eHi)

    // single-column layout: near-perfect on its own column, useless on
    // the other (every file spans ~the whole event_id domain)
    assert(sU <= 0.25, s"clustered user_id pruning weak: $sU")
    assert(sE >= 0.9, s"control should NOT prune event_id: $sE")
    // z-order: BOTH columns prune — each range reads a strict subset,
    // and the two fractions are of the same order (~sqrt(n)/n shape)
    assert(zU <= 0.75, s"zorder user_id pruning absent: $zU")
    assert(zE <= 0.75, s"zorder event_id pruning absent: $zE")

    // correctness unchanged by layout, predicates pushed
    val scan = spark.read.parquet(zdir)
      .where($"user_id".between(uLo, uHi) && $"event_id".between(eLo, eHi))
    assert(scan.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(scan.count() === events
      .where($"user_id".between(uLo, uHi) && $"event_id".between(eLo, eHi))
      .count())
  }
}

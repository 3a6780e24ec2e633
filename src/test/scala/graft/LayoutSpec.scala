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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Write-side data layout for scan pruning — the storage half of the
  * 100 TB read story. Parquet keeps min/max statistics per row group and
  * per file; a filtered scan can skip a unit entirely iff the data is
  * CLUSTERED so each unit covers a narrow slice of the filter column.
  * A hash-partitioned write (the shuffle default) scatters every key
  * range across every file and makes those stats useless — a range-based
  * filter then reads the whole table no matter what the planner pushes
  * down.
  *
  * `clusteredWrite` = `repartitionByRange` (range-partitioned shuffle
  * with a sampled range boundary estimation — one pass, no global sort)
  * + `sortWithinPartitions` (so row groups WITHIN a file are also
  * disjoint) + parquet write. The result: file- and row-group-level
  * min/max on the clustering columns are pairwise disjoint, so a pushed
  * range predicate prunes proportionally to its selectivity. This is the
  * single-column form of the layout families (Z-order etc.) used for
  * multi-column pruning.
  */
object Layout {

  /** Write `df` to `path` as parquet clustered on `cols`: `files` range
    * partitions, rows sorted by `cols` within each. Returns nothing; the
    * layout contract (disjoint per-file key ranges) is pinned by
    * LayoutSpec reading the written footers. */
  def clusteredWrite(df: DataFrame, path: String, files: Int, cols: Column*): Unit =
    df.repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
}

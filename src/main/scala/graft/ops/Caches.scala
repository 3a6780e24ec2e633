package graft.ops

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

/** Cache-lifetime helpers. Spark's `Dataset.persist` goes through the
  * CacheManager, which holds the entry until an explicit `unpersist` —
  * a lazily-returned DataFrame therefore can't both (a) reuse a cached
  * upstream and (b) release that cache before the caller evaluates it.
  * The single-job escape hatch is to *materialize the small end product*
  * (pair list, drop-id set, report row) into a driver-local relation,
  * release the big upstream cache, and hand the caller the local copy.
  * The multi-job / 100 TB form writes the intermediate to storage
  * instead (see TextOps scaladoc) — localization is bounded by
  * `maxRows` so it can never silently swallow an at-scale result.
  */
object Caches {

  /** Collect `df` into a LocalRelation-backed DataFrame iff it has at
    * most `maxRows` rows; None when it is too large to localize. Row
    * order is preserved (single local partition). */
  def localize(df: DataFrame, maxRows: Int): Option[DataFrame] = {
    val rows = df.limit(maxRows + 1).collect()
    if (rows.length > maxRows) None
    else Some(df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema))
  }
}

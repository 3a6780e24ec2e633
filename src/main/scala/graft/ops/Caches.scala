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
  *
  * SCALE NOTE (the deployment contract for the call-site caps —
  * IvfIndex / LshIndex / PqIndex probe results, NN-Descent round edges):
  * every caller treats `None` as "too big to localize" and falls back
  * to `persist()`/`localCheckpoint`, so correctness NEVER depends on
  * localization succeeding — the cap only trades driver heap for
  * avoiding a cluster-side materialization. On a real cluster the
  * default caps (typically `1 << 22` rows ≈ 4 M) assume driver heap in
  * the tens of GiB for wide rows; a deployment sizes the cap to its
  * driver via [[MaxRowsConf]] (one setting governs every call site)
  * rather than editing call sites. A workload whose probe batches
  * overflow the cap on EVERY batch should set the cap to 0 — taking the
  * cluster-side fallback deliberately instead of paying a doomed
  * `limit(cap+1).collect()` probe per batch. */
object Caches {

  /** Session conf that overrides every call site's `maxRows` default:
    * `spark.conf.set(MaxRowsConf, n)`. `0` disables localization
    * (always the cluster-side fallback); unset keeps call-site
    * defaults. */
  val MaxRowsConf = "spark.graft.localize.maxRows"

  /** The effective cap: the [[MaxRowsConf]] session override when set,
    * else the call site's `default`. Rejects malformed/negative
    * overrides with an error NAMING the conf key (a bare toInt deep
    * inside a query's plan was undiagnosable — r14 advice); values
    * above Int.MaxValue clamp (a cap that large never localizes in
    * practice anyway). */
  def effectiveMaxRows(df: DataFrame, default: Int): Int =
    df.sparkSession.conf.getOption(MaxRowsConf).map { s =>
      val v =
        try s.trim.toLong
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$MaxRowsConf must be a non-negative integer row cap " +
              s"(0 disables localization), got '$s'")
        }
      require(v >= 0,
        s"$MaxRowsConf must be >= 0 (0 disables localization), got $s")
      math.min(v, Int.MaxValue.toLong).toInt
    }.getOrElse(default)

  /** Collect `df` into a LocalRelation-backed DataFrame iff it has at
    * most `maxRows` rows (as overridden by [[MaxRowsConf]]); None when
    * it is too large to localize — callers fall back to persist /
    * localCheckpoint. Row order is preserved (single local partition). */
  def localize(df: DataFrame, maxRows: Int): Option[DataFrame] = {
    val cap = effectiveMaxRows(df, maxRows)
    if (cap <= 0) return None
    val rows = df.limit(cap + 1).collect()
    if (rows.length > cap) None
    else Some(df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting: split each hot key across `buckets`
  * sub-keys for the expensive first aggregation, then re-aggregate the
  * per-salt partials. Turns one straggler task per hot key into `buckets`
  * parallel tasks; the second pass touches only |keys|×buckets rows.
  *
  * The salt must be DETERMINISTIC (derived from data, not rand()) or
  * retried tasks double-count — `saltFrom` picks the column whose hash
  * spreads the key's rows.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers sort-merge JOIN skew at runtime; salting is for
  * aggregation skew and for joins AQE can't split (e.g. broadcast-ineligible
  * hot build sides).
  */
object SkewOps {

  /** Deterministic salt column in [0, buckets). */
  def salt(saltFrom: Column, buckets: Int): Column =
    pmod(xxhash64(saltFrom), lit(buckets))

  /** Two-phase salted sum/count aggregate: semantically identical to
    * `df.groupBy(keys).agg(count, sum(valueCol))` for any skew. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], saltFrom: Column,
      valueCol: Column, buckets: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("__salt", salt(saltFrom, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }
}

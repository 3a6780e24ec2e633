package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: the co-located-join posture for repeated
  * large joins (SURVEY.md §4 / build brief "co-locate joins via
  * bucketing"). Writing both sides bucketed by the join key into the
  * session catalog lets every subsequent equi-join run with ZERO exchange
  * — the shuffle is paid once at write time instead of per query. At
  * 100 TB this is the difference between re-shuffling the fact table per
  * join and a map-side sort-merge.
  */
object Bucketing {

  /** Persist `df` as a bucketed (and sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Spark plans a sort-merge join with NO Exchange on
    * either side (verified in BucketingSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}

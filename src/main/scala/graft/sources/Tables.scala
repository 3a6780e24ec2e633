package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.model.TestData

/** Schema-bound loaders for the driver-supplied parquet tables.
  *
  * Scale posture: every read binds an explicit schema — mirroring the
  * reference's Glue job, which binds a pre-inferred schema to its staging
  * read (reference: toy_example/toy_glue.py:34-38) — so a 100 TB tree
  * never pays per-file schema inference/merging, and column pruning +
  * filter pushdown resolve against a stable schema.
  */
object Tables {
  private val schemas: Map[String, StructType] = Map(
    "events" -> TestData.eventRaw,
    "documents" -> TestData.document,
    "embeddings" -> TestData.embedding)

  /** Read `<dir>/<name>.parquet`, schema-bound when we model the table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    schemas.get(name) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None    => spark.read.parquet(path) // TPC-H-ish dims: footer-only
    }
  }

  /** The events table's `ts` is parquet TIMESTAMP(NANOS) — illegal for
    * Spark's micros TimestampType. We read it as epoch-nanos LONG (the
    * documented `nanosAsLong` escape hatch) and convert with integer
    * division (a double division would lose precision: 2024 epoch-nanos
    * ≈ 1.7e18 > 2^53). The generator emits whole microseconds, so the
    * `div 1000` truncation is exact.
    *
    * The nanos flag is passed as a per-read datasource option (file-source
    * options merge into the scan's hadoop conf), NOT `spark.conf.set` — a
    * session-wide set would silently change nanos semantics for every
    * later parquet read in the same session. */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schemas("events"))
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Fan a small-but-compute-heavy input out to all cores — but ONLY when
    * the scan itself is under-parallel. The local test files are
    * single-row-group parquet (the row group is the minimum scan split),
    * so expression-heavy per-row work (md5 shingling, json encode/decode,
    * cosine) would otherwise run on ONE task regardless of
    * `maxPartitionBytes`. A real multi-row-group/multi-file 100 TB table
    * already scans at ≥ defaultParallelism, and repartitioning it would be
    * a pointless full shuffle of the fact table — so the exchange is
    * gated on the planned scan partition count and becomes a no-op there. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
}

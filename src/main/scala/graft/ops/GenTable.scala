package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared storage plumbing of the persisted index families (LshIndex,
  * SimHashIndex): the hash-bucket + generation hive layout and the
  * `_index_meta` layout contract. Factored here so both families write
  * IDENTICAL storage shapes — one place to change the commit/layout
  * rules, and the scaladoc on LshIndex (the original) stays the
  * authoritative description of why each piece exists.
  */
private[ops] object GenTable {

  import java.nio.charset.StandardCharsets.UTF_8
  import org.apache.hadoop.fs.{Path => HPath}

  /** Hive-partitioned clustered write (see LshIndex.writePartitioned's
    * original scaladoc): hash-shuffle on the caller-computed `__part`
    * bucket, per-task sort on (bucket, cluster key) → one fully-sorted
    * file per bucket directory per write. `gen` is the second partition
    * level; "replace-gen" = dynamic partition overwrite (a retry
    * replaces exactly its own generation — the exactly-once-on-storage
    * contract). */
  def writePartitioned(df: DataFrame, path: String, files: Int,
      mode: String, gen: String, cluster: Column*): Unit = {
    val out = df.repartition(files, col("__part"))
      .sortWithinPartitions(col("__part") +: cluster: _*)
      .withColumnRenamed("__part", "pk")
      .withColumn("gen", lit(gen))
      .write.partitionBy("pk", "gen")
    (mode match {
      case "replace-gen" =>
        out.option("partitionOverwriteMode", "dynamic").mode("overwrite")
      case m => out.mode(m)
    }).parquet(path)
  }

  /** Multi-generation STATIC-overwrite write for the compaction paths:
    * `gen` comes from the per-row `__gen` column, so a keepBatch fold
    * lands its folded `base` AND the kept in-flight generation in ONE
    * shuffle + write job instead of two serial table writes (the
    * overwrite-then-append spelling — the dominant fixed cost of a
    * short-cadence in-stream compaction, guide §2.4). Output shape is
    * identical: a task holds every row of its pk bucket (hash shuffle
    * on `__part` alone), rows sort (pk, gen, cluster…) so the writer
    * emits one cluster-sorted file per (pk, gen) directory without an
    * extra writer-side sort. */
  def writeGens(df: DataFrame, path: String, files: Int,
      cluster: Column*): Unit =
    df.repartition(files, col("__part"))
      .sortWithinPartitions(col("__part") +: col("__gen") +: cluster: _*)
      .withColumnRenamed("__part", "pk")
      .withColumnRenamed("__gen", "gen")
      .write.partitionBy("pk", "gen")
      .mode("overwrite").parquet(path)

  /** The generation partition values present on disk — ONE driver-side
    * glob over the hive layout (no Spark job): `gen` is the leaf
    * partition level, nested under `pk=*` for the bucketed tables
    * (`nested = true`) or top-level otherwise. The in-stream compaction
    * paths use this to SKIP a fold that would rewrite nothing (every
    * generation is already `base` or the kept batch, and no tombstone is
    * pending) — a verbatim no-op whose two table rewrites were the
    * dominant fixed cost of a short-cadence `compactEvery`. */
  def genNames(spark: SparkSession, table: String, nested: Boolean): Set[String] = {
    val p = new HPath(table)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else {
      val pat = if (nested) new HPath(table, "*/gen=*") else new HPath(table, "gen=*")
      fs.globStatus(pat).map(_.getPath.getName.stripPrefix("gen=")).toSet
    }
  }

  /** Persist the layout contract next to the tables — probes ADOPT the
    * persisted values, so a drifted caller default cannot mis-prune. */
  def writeMeta(spark: SparkSession, metaFile: HPath,
      kv: Seq[(String, Int)]): Unit = {
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(metaFile, true)
    try out.write(kv.map { case (k, v) => s"$k=$v\n" }.mkString.getBytes(UTF_8))
    finally out.close()
  }

  /** Read the persisted layout; a missing meta file fails loudly (the
    * path predates its build, or is not an index of this family). */
  def readMeta(spark: SparkSession, metaFile: HPath): Map[String, Int] = {
    val fs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaFile))
      throw new IllegalStateException(
        s"$metaFile missing — the index predates its build, or the path " +
          "is not an index of this family; rebuild first")
    val in = fs.open(metaFile)
    try scala.io.Source.fromInputStream(in, UTF_8.name()).getLines()
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => scala.util.Try(k.trim -> v.trim.toInt).toOption
          case _           => None
        }
      }.toMap
    finally in.close()
  }
}

package graft.ops

/** Query-local scratch placement — ONE policy for every temp directory
  * the index-lifecycle queries and streaming harnesses stage under.
  *
  * Why this exists: the lifecycle queries (q61–q63, q97, q100/q101,
  * q105/q106, q109) build real on-disk indexes in per-query temp dirs.
  * `Files.createTempDirectory(prefix)` puts those on `java.io.tmpdir` =
  * disk-backed `/tmp`, while Bench deliberately routes Spark's own
  * scratch (`spark.local.dir`) to tmpfs (`/dev/shm`) — so index staging
  * was the one write path still hitting the disk. On a loaded machine
  * the resulting dirty-page writeback is not even charged to the query
  * that caused it: the flusher thread drains asynchronously and taxes
  * whatever queries run NEXT (recorded round-11 artifact: q109 10.7×
  * slow, ~75 s of writeback bled into the four queries after it).
  *
  * Policy (mirrors Bench.scala and StreamQueries.newCheckpointDir):
  *  1. `SPARK_GRAFT_SCRATCH` env var when set (driver/CI override);
  *  2. `/dev/shm` when writable (tmpfs: bytes die in RAM, no writeback);
  *  3. `java.io.tmpdir` otherwise.
  * All graft scratch collects under one `graft_scratch/` parent so a
  * crashed run is cleaned with a single rm -rf.
  *
  * This is a MEASUREMENT-HARNESS placement choice only: production
  * indexes live on durable storage (S3/HDFS) and the lifecycle ops take
  * explicit paths — nothing in ops/ hardcodes this policy.
  */
object Scratch {

  /** The preferred scratch root (created on first use). */
  def root(): java.io.File = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH").map(new java.io.File(_))
      .getOrElse {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite) shm
        else new java.io.File(System.getProperty("java.io.tmpdir"))
      }
    val r = new java.io.File(base, "graft_scratch")
    r.mkdirs()
    r
  }

  /** Fresh scratch directory under [[root]] — drop-in replacement for
    * `Files.createTempDirectory(prefix)`. Caller owns cleanup (the
    * lifecycle queries delete in `finally` / `deleteOnExit`). */
  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root().toPath, prefix).toString
}

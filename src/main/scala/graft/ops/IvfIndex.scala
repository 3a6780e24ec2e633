package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF coarse quantizer — the production form of the declared
  * q54 (ExtQueries.scala), which derives its centroids from the corpus
  * inside the query. Real IVF trains centroids ONCE (k-means or, as in
  * the declared query's deterministic stand-in, a fixed sample), persists
  * them, and every subsequent ANN query reads them back: the corpus scan
  * never re-derives the quantizer, and the centroid table is tiny by
  * construction (K vectors — IVF's defining property is that the coarse
  * quantizer fits on the driver, which is what lets cell assignment ship
  * as literals in a map-side expression).
  *
  * Storage is one [[Layout.clusteredWrite]] parquet table
  * (centroid_id, embedding), clustered on centroid_id.
  */
object IvfIndex {

  /** Persist `centroids` (centroid_id, embedding) at `path` — one
    * clusteredWrite, single file (the table is K rows). */
  def writeCentroids(centroids: DataFrame, path: String): Unit =
    Layout.clusteredWrite(
      centroids.select(col("centroid_id"), col("embedding")),
      path, files = 1, col("centroid_id"))

  /** Read the persisted centroids back, ordered by centroid_id. The
    * collect is bounded by K (the table IS the coarse quantizer — if it
    * doesn't fit on the driver it isn't an IVF quantizer); the guard
    * fails loudly rather than silently localizing a mis-pointed path. */
  def loadCentroids(spark: SparkSession, path: String,
      maxK: Int = 1 << 16): Seq[Seq[Float]] = {
    val rows = spark.read.parquet(path)
      .orderBy(col("centroid_id"))
      .select(col("embedding"))
      .limit(maxK + 1).collect()
    require(rows.length <= maxK,
      s"centroid table at $path exceeds $maxK rows — not a coarse quantizer")
    rows.map(_.getSeq[Float](0).toSeq).toSeq
  }
}

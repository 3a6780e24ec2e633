package graft

import graft.ops.IvfIndex
import graft.queries.{ExtQueries, Queries}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Persisted-centroid IVF: training writes the coarse quantizer once,
  * queries read it back — and the persisted spelling must return exactly
  * what the declared q54 (which re-derives centroids in-query) returns. */
class IvfIndexSpec extends SparkSpecBase {

  test("annIvfPersisted over written centroids ≡ declared q54") {
    val path = tmpDir("ivf_centroids")
    IvfIndex.writeCentroids(
      Tables.embeddings(spark, sf0001).where(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding")),
      path)
    val persisted = ExtQueries.annIvfPersisted(spark, sf0001, path).collect()
    val declared = Queries.all.find(_.name == "q54_ann_ivf").get
      .fn(spark, sf0001).collect()
    assert(persisted.toSeq == declared.toSeq)
  }

  test("loadCentroids preserves order and refuses unbounded tables") {
    val path = tmpDir("ivf_centroids_order")
    IvfIndex.writeCentroids(
      Tables.embeddings(spark, sf0001).where(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding")),
      path)
    val cents = IvfIndex.loadCentroids(spark, path)
    assert(cents.size == 16)
    // order matches centroid_id order (cell ids depend on it)
    val direct = Tables.embeddings(spark, sf0001).where(col("vec_id") < 16)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    assert(cents == direct)
    intercept[IllegalArgumentException] {
      IvfIndex.loadCentroids(spark, path, maxK = 8)
    }
  }
}

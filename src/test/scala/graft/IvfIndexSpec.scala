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

  test("kmeansTrain converges to the obvious cluster means on separable " +
    "data and empty cells keep their previous centroid") {
    import spark.implicits._
    // two tight clusters around +x and +y; seed = first 2 vectors, one
    // drawn from each cluster
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.1f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)), (3L, Seq(0.1f, 0.9f, 0.0f)),
      (4L, Seq(0.95f, 0.0f, 0.05f)), (5L, Seq(0.0f, 0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val cents = IvfIndex.kmeansTrain(vecs, k = 2, iters = 2)
    assert(cents.size == 2)
    // cluster 0 (x-dominant) mean of vecs 0,2,4; cluster 1 of 1,3,5
    def approx(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-5 }
    assert(approx(cents(0), Seq(0.95f, 0.1f / 3, 0.05f / 3)), s"got ${cents(0)}")
    assert(approx(cents(1), Seq(0.1f / 3, 0.95f, 0.05f)), s"got ${cents(1)}")
    // trained quantizer drops into the assignment expression unchanged
    val cells = vecs.withColumn("cell",
      IvfIndex.cellOf(spark, col("embedding"), cents))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(cells == Map(0L -> 0, 2L -> 0, 4L -> 0, 1L -> 1, 3L -> 1, 5L -> 1))

    // identical vectors: every row ties to the HIGHER cell (the ANN tie
    // rule), so cell 0 empties and must keep its previous centroid
    val same = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c2 = IvfIndex.kmeansTrain(same, k = 2, iters = 1)
    assert(c2(0) == Seq(1.0f, 0.0f), "empty cell 0 keeps its seed centroid")
    assert(c2(1) == Seq(1.0f, 0.0f))
  }

  test("trainAndWrite roundtrips: loadCentroids returns the trained " +
    "quantizer exactly") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.8f, 0.2f)), (3L, Seq(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val path = tmpDir("ivf_trained")
    val trained = IvfIndex.trainAndWrite(vecs, path, k = 2, iters = 2)
    assert(IvfIndex.loadCentroids(spark, path) == trained)
  }
}

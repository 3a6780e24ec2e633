package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins q158's two-phase degree cap (salt-local top-k, then global
  * top-k over the survivors) exactly equal to the one-window spelling
  * on a hub-skewed graph — the monotone-selection argument (global
  * top-k ⊆ union of salt-local top-ks for ANY salting) made executable.
  * The fixture's hub has 2000 out-edges vs cap 8, so a wrong phase-1
  * cut (e.g. capping at < cap per salt, or salting by src) would
  * change the winners and fail the equality. */
class CappedTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private val cap = 8

  test("two-phase salt-local/global top-cap equals the one-window cap " +
    "on a hub-skewed edge list, for several salt widths") {
    // hub vertex 0 -> 2000 dsts; plus a fringe of small-degree vertices
    val edges = ((1L to 2000L).map(d => (0L, d)) ++
      (1L to 50L).flatMap(s => (1L to (s % 11)).map(j => (s, s * 1000 + j))))
      .toDF("src", "dst")
      .repartition(13) // odd partitioning; result must not depend on it
    val mk = md5(concat(col("src").cast("string"), lit("|"),
      col("dst").cast("string")))
    val wGlobal = Window.partitionBy(col("src")).orderBy(col("mk"), col("dst"))
    val oneWindow = edges.withColumn("mk", mk)
      .withColumn("rn", row_number().over(wGlobal))
      .where(col("rn") <= cap)
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (salts <- Seq(2L, 64L, 1024L)) {
      val wLocal = Window.partitionBy(col("src"), col("salt"))
        .orderBy(col("mk"), col("dst"))
      val twoPhase = edges.withColumn("mk", mk)
        .withColumn("salt", pmod(xxhash64(col("dst")), lit(salts)))
        .withColumn("lrn", row_number().over(wLocal))
        .where(col("lrn") <= cap)
        .withColumn("rn", row_number().over(wGlobal))
        .where(col("rn") <= cap)
        .select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(twoPhase == oneWindow, s"salts=$salts")
    }
    // every vertex keeps min(deg, cap) edges — the no-dangling guarantee
    val perSrc = oneWindow.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perSrc(0L) == cap)
    assert((1L to 50L).filter(_ % 11 != 0).forall(s =>
      perSrc(s) == math.min(s % 11, cap.toLong)))
  }
}

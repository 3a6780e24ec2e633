package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-batch logistic-regression TRAINING at corpus scale — the "train"
  * half of the hashed-feature quality classifier (q80 scores with fixed
  * weights; this learns them, the DCLM/fastText-style pipeline stage).
  *
  * Scale shape mirrors `IvfIndex.kmeansTrain`: the model (D doubles) lives
  * on the driver and rides each iteration's plan as a LITERAL array, so
  * per iteration the feature table is scanned twice inside ONE job (once
  * through the margin sub-aggregate, once for the gradient terms), the
  * only shuffles are keyed on doc_id / dim, and the driver collects
  * exactly D gradient rows — never data. The feature table (doc_id, j, x)
  * is the caller's to persist across iterations; nothing here caches.
  *
  * Numeric determinism (the q88 rule): weights are rounded to 6 decimals
  * BETWEEN iterations, so an oracle unrolling the same schedule starts
  * every iteration from bit-identical weights and double-sum
  * order-difference (~1e-15) cannot compound across rounds.
  */
object LogReg {

  /** Hash bucket of a token under the q80 convention (first 6 md5 hex
    * digits), folded to `dims` buckets — reproducible in DuckDB as
    * ('0x' || substr(md5(term), 1, 6))::BIGINT % dims. */
  def bucketOf(term: Column, dims: Int): Column =
    pmod(conv(substring(md5(term.cast("binary")), 1, 6), 16, 10).cast("long"),
      lit(dims.toLong)).cast("int")

  /** Train `iters` full-batch gradient steps from w = 0 with rate `lr`.
    *
    * @param feat   (doc_id, j, x) rows — sparse features, absent = 0
    * @param labels (doc_id, y) with y ∈ {0.0, 1.0}, one row per doc
    * @return the learned weights, one per dim, 6-decimal rounded
    */
  def train(feat: DataFrame, labels: DataFrame, dims: Int, iters: Int,
      lr: Double = 1.0): Array[Double] = {
    val n = labels.count().toDouble
    require(n > 0, "LogReg.train: empty label table (gradient would be 0/0)")
    // Loud-failure contract: a j outside [0, dims) would make element_at
    // return null, silently dropping the row from the margin and gradient
    // sums — quietly wrong weights. One bounded validation job per train
    // call (not per iteration) catches mis-bucketed features instead.
    val badJ = feat.where(col("j") < 0 || col("j") >= dims).count()
    require(badJ == 0,
      s"LogReg.train: $badJ feature rows have j outside [0, $dims) - " +
        "features must be bucketed with LogReg.bucketOf(term, dims)")
    var w = Array.fill(dims)(0.0)
    for (_ <- 0 until iters) {
      val wLit = array(w.map(lit): _*)
      // margin per doc under the current (literal) weights …
      val z = feat
        .select(col("doc_id"), (col("x") * element_at(wLit, col("j") + 1)).as("t"))
        .groupBy(col("doc_id")).agg(sum(col("t")).as("z"))
      // … then gradient_j = (1/N) Σ_d (sigmoid(z_d) − y_d)·x_dj, collected
      // as exactly `dims` rows.
      val grad = feat
        .join(z, "doc_id").join(labels, "doc_id")
        .select(col("j"),
          ((lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")) * col("x")).as("g"))
        .groupBy(col("j")).agg(sum(col("g")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = Array.tabulate(dims) { j =>
        BigDecimal(w(j) - lr * grad.getOrElse(j, 0.0) / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w
  }
}

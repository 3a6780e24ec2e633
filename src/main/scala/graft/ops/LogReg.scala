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

  /** ONE-VS-REST training for every class in one pass — C independent
    * binary models (identical math, schedule and rounding to [[train]]
    * per class, so a per-class [[train]] loop would learn bit-identical
    * weights) but with the per-iteration work FUSED: the margin and
    * gradient aggregations carry one sum column per class, so each
    * iteration is still ONE job over the feature table regardless of C,
    * and the driver collects D gradient rows of C columns. At 100
    * languages that is 2 jobs instead of 200 — the difference between a
    * lang-id stage and a lang-id campaign.
    *
    * @param feat    (doc_id, j, x) rows — sparse features, absent = 0
    * @param labels  (doc_id, label) — each doc's declared class
    * @param classes the class vocabulary, sorted ascending (argmax ties
    *                break toward the earliest entry downstream)
    * @return per-class weights in `classes` order, 6-decimal rounded
    */
  def trainMulti(feat: DataFrame, labels: DataFrame, classes: Seq[String],
      dims: Int, iters: Int, lr: Double = 1.0): Seq[Array[Double]] = {
    require(classes.nonEmpty, "LogReg.trainMulti: no classes")
    val n = labels.count().toDouble
    require(n > 0, "LogReg.trainMulti: empty label table (gradient would be 0/0)")
    val badJ = feat.where(col("j") < 0 || col("j") >= dims).count()
    require(badJ == 0,
      s"LogReg.trainMulti: $badJ feature rows have j outside [0, $dims) - " +
        "features must be bucketed with LogReg.bucketOf(term, dims)")
    var w: Seq[Array[Double]] = classes.map(_ => Array.fill(dims)(0.0))
    for (_ <- 0 until iters) {
      val wLits = w.map(wc => array(wc.map(lit): _*))
      val z = feat
        .groupBy(col("doc_id"))
        .agg(sum(col("x") * element_at(wLits.head, col("j") + 1)).as("z0"),
          wLits.tail.zipWithIndex.map { case (wl, i) =>
            sum(col("x") * element_at(wl, col("j") + 1)).as(s"z${i + 1}")
          }: _*)
      val gradRows = feat
        .join(z, "doc_id").join(labels, "doc_id")
        .groupBy(col("j"))
        .agg(gradCol(classes.head, "z0").as("g0"),
          classes.tail.zipWithIndex.map { case (c, i) =>
            gradCol(c, s"z${i + 1}").as(s"g${i + 1}")
          }: _*)
        .collect()
      val grad = gradRows.map(r =>
        r.getInt(0) -> classes.indices.map(k => r.getDouble(k + 1))).toMap
      w = classes.indices.map { k =>
        Array.tabulate(dims) { j =>
          BigDecimal(w(k)(j) - lr * grad.get(j).map(_(k)).getOrElse(0.0) / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    w
  }

  /** One class's gradient addend under the current margins:
    * (sigmoid(z_c) − [label = c])·x. */
  private def gradCol(cls: String, zCol: String): Column =
    sum((lit(1.0) / (lit(1.0) + exp(-col(zCol))) -
      when(col("label") === cls, 1.0).otherwise(0.0)) * col("x"))

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

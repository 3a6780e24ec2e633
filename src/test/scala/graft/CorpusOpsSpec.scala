package graft

import org.apache.spark.sql.functions._
import graft.queries.Queries

/** Pins for the round-9 corpus-maintenance operators: q73 span-fingerprint
  * dedup, q74 mixture sampling, q75 corpus delta. Each is oracle-checked
  * end-to-end by the driver; these tests pin the SEMANTIC invariants the
  * hash compare alone would not explain if it ever went red.
  */
class CorpusOpsSpec extends SparkSpecBase {

  private def run(name: String) =
    Queries.all.find(_.name == name).get.fn(spark, sf0001)

  test("q73: content-defined span fingerprints pair verbatim excerpts " +
    "with their source doc regardless of position") {
    val pairs = run("q73_span_fingerprint_dedup").collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)), "pairs must be a < b")
    // every fabricated excerpt doc that appears pairs with its own source:
    // the excerpt starts at word 3, so a positional scheme would miss it —
    // mod-p selection is alignment-independent.
    val excerptPairs = pairs.filter(_.getLong(1) >= 2000000L)
    assert(excerptPairs.nonEmpty, "no fabricated excerpt pair surfaced")
    val withOwnSource = excerptPairs.count(r => r.getLong(1) - 2000000L == r.getLong(0))
    // ≥2-fingerprint threshold can drop a few short excerpts; most survive
    assert(withOwnSource * 2 > spark.read
      .parquet(s"$sf0001/documents.parquet")
      .where(pmod(col("doc_id"), lit(7)) === 0).count().toInt / 2,
      "most excerpts should pair with their source doc")
  }

  test("q74: temperature sampling up-weights tail languages and is " +
    "deterministic") {
    val a = run("q74_mixture_sampling").collect()
    val b = run("q74_mixture_sampling").collect()
    assert(a.toSeq == b.toSeq, "hash-derived sampling must be reproducible")
    val byLang = a.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // α=0.5 compresses the mix: the head language keeps a LOWER rate than
    // every tail language
    val (headLang, _) = byLang.maxBy(_._2._1)
    val headRate = byLang(headLang)._3
    byLang.filterNot(_._1 == headLang).foreach { case (l, (_, _, r)) =>
      assert(r > headRate, s"tail lang $l rate $r should exceed head rate $headRate")
    }
    // kept counts stay within each lang's population and near rate*n
    byLang.foreach { case (l, (n, kept, rate)) =>
      assert(kept <= n)
      assert(math.abs(kept - rate * n) <= math.max(8.0, 4 * math.sqrt(n)),
        s"$l kept=$kept far from rate*n=${rate * n}")
    }
  }

  test("q75: delta statuses are exactly the fabricated add/remove/change sets") {
    val delta = run("q75_corpus_delta").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expAdded = ids.filter(_ % 10 == 0)
    val expChanged = ids.filter(i => i % 7 == 0 && i % 10 != 0)
    val expRemoved = ids.filter(_ % 13 == 0).map(_ + 3000000L)
    assert(delta.filter(_._2 == "added").keySet == expAdded)
    assert(delta.filter(_._2 == "changed").keySet == expChanged)
    assert(delta.filter(_._2 == "removed").keySet == expRemoved)
    assert(delta.size == expAdded.size + expChanged.size + expRemoved.size,
      "no unchanged doc may leak into the delta")
  }
}

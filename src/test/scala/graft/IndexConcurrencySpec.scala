package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.functions._
import graft.ops.{IndexLock, IvfIndex, LshIndex}

/** Pins the writer fence (ops/IndexLock): a compaction racing an
  * append on the SAME index serializes instead of losing the append —
  * unfenced, the rename-aside commit replaces the table after the
  * compaction's read, so a generation written in between vanishes.
  * One deterministic mutual-exclusion pin plus end-state checks on real
  * two-thread races for both index families.
  */
class IndexConcurrencySpec extends SparkSpecBase {
  import spark.implicits._

  test("IndexLock.withWriter is mutually exclusive per path and " +
    "reentrant within a holder") {
    val path = "/tmp/idx_lock_pin"
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val secondRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t1 = new Thread(() => IndexLock.withWriter(path) {
      IndexLock.withWriter(path) { entered.countDown() } // reentrant
      release.await(30, TimeUnit.SECONDS); ()
    })
    t1.start()
    assert(entered.await(30, TimeUnit.SECONDS), "holder never entered")
    val t2 = new Thread(() =>
      IndexLock.withWriter(path) { secondRan.set(true) })
    t2.start()
    Thread.sleep(200)
    assert(!secondRan.get, "second writer entered while the lock was held")
    // a DIFFERENT path must not be blocked by this holder
    IndexLock.withWriter(path + "_other") {}
    release.countDown()
    t2.join(30000); t1.join(30000)
    assert(secondRan.get, "second writer never ran after release")
  }

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("LSH: compact racing probeAndAppend never loses the appended " +
    "generation; the end state equals a serial order's") {
    val corpus = (1L to 200L).map(i =>
      (i, s"document $i about topic ${i % 7} alpha beta gamma delta ${i * 31}"))
      .toDF("doc_id", "text")
    for (round <- 1 to 2) {
      val idx = tmpDir(s"lsh_race_$round")
      LshIndex.build(corpus, idx)
      // accumulated generations give compact real work to do mid-race
      (0 until 3).foreach { i =>
        LshIndex.probeAndAppend(spark, idx,
          docs((1000L + i) -> s"document ${i + 3} about topic $i alpha beta gamma delta ${93 + i}"),
          batchId = Some(i.toLong))
      }
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def thread(f: => Unit) = new Thread(() =>
        try f catch { case t: Throwable => errs.add(t); () })
      val appended = docs(5000L -> "document 99 about topic 1 alpha beta gamma delta 42")
      // alternate which side launches first across rounds
      val a = thread(LshIndex.compact(spark, idx))
      val b = thread(LshIndex.probeAndAppend(spark, idx, appended,
        batchId = Some(9L)))
      val (first, second) = if (round % 2 == 0) (a, b) else (b, a)
      first.start(); second.start()
      first.join(120000); second.join(120000)
      assert(errs.isEmpty, s"racing writers failed: ${errs.peek()}")
      // the appended doc survived whichever serialization happened,
      // exactly once, in BOTH tables
      assert(spark.read.parquet(s"$idx/sigs")
        .where($"doc_id" === 5000L).count() === 1L,
        "append lost (or duplicated) by the racing compaction")
      assert(spark.read.parquet(s"$idx/bands")
        .where($"doc_id" === 5000L).count() > 0L)
      // every pre-race doc also survived
      assert(spark.read.parquet(s"$idx/sigs").select("doc_id")
        .distinct().count() === 204L)
    }
  }

  test("SimHash (hashCol fingerprints): compact racing probeAndAppend " +
    "never loses the appended generation") {
    import graft.ops.SimHashIndex
    // precomputed 63-bit fingerprints (the q132 image-dHash path): the
    // index machinery must fence identically when no text is involved
    def hashes(rows: (Long, Long)*) = rows.toDF("doc_id", "sh")
    val base = (1L to 120L).map(i => (i, (i % 13) * 0x1111111L))
    val idx = tmpDir("simhash_race")
    SimHashIndex.build(hashes(base: _*), idx, hashCol = Some("sh"))
    (0 until 3).foreach { i =>
      SimHashIndex.probeAndAppend(spark, idx,
        hashes((1000L + i) -> ((i % 13) * 0x1111111L)),
        batchId = Some(i.toLong), hashCol = Some("sh"))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(f: => Unit) = new Thread(() =>
      try f catch { case t: Throwable => errs.add(t); () })
    val a = thread(SimHashIndex.compact(spark, idx))
    val b = thread(SimHashIndex.probeAndAppend(spark, idx,
      hashes(5000L -> (5L * 0x1111111L)),
      batchId = Some(9L), hashCol = Some("sh")))
    a.start(); b.start()
    a.join(120000); b.join(120000)
    assert(errs.isEmpty, s"racing writers failed: ${errs.peek()}")
    val bands = spark.read.parquet(s"$idx/bands")
    assert(bands.where($"doc_id" === 5000L).select("band").distinct()
      .count() === 4L, "append lost (or duplicated) by the racing compaction")
    assert(bands.select("doc_id").distinct().count() === 124L,
      "pre-race docs lost by the race")
  }

  test("IVF: compactCorpus racing probeAndAppend keeps every vector " +
    "exactly once") {
    val cents = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val base = (0L until 50L).map(i =>
      (i, if (i % 2 == 0) Seq(1.0f, i.toFloat / 100f) else Seq(i.toFloat / 100f, 1.0f)))
      .toDF("vec_id", "embedding")
    val path = tmpDir("ivf_race") + "/corpus"
    IvfIndex.buildCorpus(base, path, cents, files = 2)
    (0 until 3).foreach { i =>
      IvfIndex.probeAndAppend(spark, path,
        Seq((100L + i, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding"),
        cents, Some(i.toLong))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(f: => Unit) = new Thread(() =>
      try f catch { case t: Throwable => errs.add(t); () })
    val a = thread(IvfIndex.compactCorpus(spark, path, files = 2))
    val b = thread(IvfIndex.probeAndAppend(spark, path,
      Seq((500L, Seq(0.7f, 0.7f))).toDF("vec_id", "embedding"),
      cents, Some(9L)))
    a.start(); b.start()
    a.join(120000); b.join(120000)
    assert(errs.isEmpty, s"racing writers failed: ${errs.peek()}")
    val counts = spark.read.parquet(path).groupBy("vec_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.getOrElse(500L, 0L) === 1L,
      "append lost (or duplicated) by the racing compaction")
    assert(counts.size === 54 && counts.values.forall(_ == 1L),
      s"corpus corrupted by the race: ${counts.filter(_._2 != 1L)}")
  }

  test("graph: compact racing probeAndAppend keeps every node exactly " +
    "once and the appended generation's edges") {
    import graft.ops.GraphIndex
    val base = (0L until 20L).map(i =>
      (i, Seq(1.0f + (i % 3) * 0.3f, 0.5f + (i % 4) * 0.2f,
        0.2f + (i % 5) * 0.1f, 1.0f - 0.02f * i)))
      .toDF("vec_id", "embedding")
    val path = tmpDir("graph_race") + "/g"
    GraphIndex.build(base, path, k = 3, maxDeg = 6, files = 2)
    (0 until 2).foreach { i =>
      GraphIndex.probeAndAppend(spark, path,
        Seq((100L + i, Seq(1.1f, 0.9f, 0.3f + 0.01f * i, 0.8f)))
          .toDF("vec_id", "embedding"),
        Some(i.toLong), k = 2, beamW = 6, hops = 3, revCap = 2)
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(f: => Unit) = new Thread(() =>
      try f catch { case t: Throwable => errs.add(t); () })
    val a = thread(GraphIndex.compact(spark, path, maxDeg = 6, files = 2))
    val b = thread(GraphIndex.probeAndAppend(spark, path,
      Seq((500L, Seq(0.9f, 1.0f, 0.4f, 0.7f))).toDF("vec_id", "embedding"),
      Some(9L), k = 2, beamW = 6, hops = 3, revCap = 2))
    a.start(); b.start()
    a.join(120000); b.join(120000)
    assert(errs.isEmpty, s"racing writers failed: ${errs.peek()}")
    val counts = spark.read.parquet(GraphIndex.nodesPath(path))
      .groupBy("vec_id").count().as[(Long, Long)].collect().toMap
    assert(counts.getOrElse(500L, 0L) === 1L,
      "insert lost (or duplicated) by the racing compaction")
    assert(counts.size === 23 && counts.values.forall(_ == 1L),
      s"node table corrupted by the race: ${counts.filter(_._2 != 1L)}")
    // the racing batch's forward edges landed and point at real nodes
    val b9 = spark.read.parquet(GraphIndex.edgesPath(path))
      .where(col("gen") === "b9" && col("src") === 500L).count()
    assert(b9 === 2L, s"racing batch wrote $b9 forward edges, want 2")
  }
}

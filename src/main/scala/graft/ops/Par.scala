package graft.ops

/** Run INDEPENDENT storage jobs concurrently from the driver. Spark
  * schedules jobs submitted by separate threads independently, so two
  * writes that touch different tables (an index's bands + sigs, a
  * graph's nodes + edges, postings + stats) need not serialize on the
  * driver's job loop — on a 32-core local session (and even more so on
  * a cluster) each micro-batch's fixed per-job floor halves. Used ONLY
  * where the writes are provably independent: different target
  * directories, no shared uncached lineage that a concurrent action
  * would recompute twice (callers persist shared inputs first — the
  * family probe/append paths already do). Failures propagate: the first
  * throwable rethrows after every job has settled, so a crashed write
  * can't be silently swallowed by its sibling's success. */
private[graft] object Par {
  def all(fs: (() => Unit)*): Unit = {
    if (fs.sizeIs <= 1) { fs.foreach(_.apply()); return }
    val errs = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()
    val ts = fs.map { f =>
      val t = new Thread(() =>
        try f() catch { case e: Throwable => errs.add(e); () })
      t.setDaemon(true)
      t.start()
      t
    }
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.get(0)
  }
}

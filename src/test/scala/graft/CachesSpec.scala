package graft

import graft.ops.Caches

/** The localize cap contract: call-site defaults, the session-conf
  * override that governs every call site at once (the 100 TB driver-
  * sizing knob), and the 0 = always-cluster-side escape hatch. */
class CachesSpec extends SparkSpecBase {

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("v")
  }

  test("localize returns Some under the cap, None over it, order kept") {
    val got = Caches.localize(df(10).orderBy(org.apache.spark.sql.functions
      .col("v").desc), maxRows = 10)
    assert(got.isDefined)
    assert(got.get.collect().map(_.getInt(0)).toSeq == (10 to 1 by -1))
    assert(got.get.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName.contains("LocalRelation")))
    assert(Caches.localize(df(11), maxRows = 10).isEmpty)
  }

  test("spark.graft.localize.maxRows overrides every call-site default") {
    try {
      spark.conf.set(Caches.MaxRowsConf, "5")
      assert(Caches.localize(df(6), maxRows = 1000).isEmpty)
      assert(Caches.localize(df(5), maxRows = 1).isDefined)
      // 0 disables localization entirely — deliberate cluster-side path
      spark.conf.set(Caches.MaxRowsConf, "0")
      assert(Caches.localize(df(1), maxRows = 1000).isEmpty)
    } finally spark.conf.unset(Caches.MaxRowsConf)
    assert(Caches.localize(df(3), maxRows = 3).isDefined)
  }
}

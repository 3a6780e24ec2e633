package graft

import graft.queries.Queries

/** Every declared query must run, return rows, and keep its oracle
  * contract (column names are what the driver hash-compares on). */
class QueriesSpec extends SparkSpecBase {

  test("registry: unique names; every declared query is oracle-paired") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size === names.size)
    val rowsOnly = Queries.all.filter(_.sql.isEmpty).map(_.name).toSet
    assert(rowsOnly === Set.empty[String]) // q34 carries bound-assertions SQL
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  Queries.all.foreach { d =>
    test(s"${d.name} runs on sf0.001 with rows > 0") {
      val df = d.fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${d.name} returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SessionTracker
import graft.streaming.SessionTracker.{ClosedSession, UserEvent}

class SessionTrackerSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1710000000000L + minute * 60000L)

  test("flatMapGroupsWithState sessionization: gap split within a batch, " +
    "merge across batches, timeout close via watermark") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val out = SessionTracker.track(mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 2 h gap
      mem.addData(UserEvent(1, ts(0)), UserEvent(1, ts(5)), UserEvent(1, ts(125)))
      q.processAllAvailable()
      val first = spark.table("sessions").as[ClosedSession].collect()
      // the 0-5 min session closed when the 125 min event arrived
      assert(first.toSeq === Seq(ClosedSession(1, ts(0), ts(5), 2)))

      // same user continues the open session within the gap
      mem.addData(UserEvent(1, ts(140)))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 1) // still open

      // advancing the watermark far past last+gap (via another key's
      // event) fires the event-time timeout and closes 125-140
      mem.addData(UserEvent(2, ts(600)))
      q.processAllAvailable()
      mem.addData(UserEvent(2, ts(601))) // one more batch to deliver timeout
      q.processAllAvailable()
      val closed = spark.table("sessions").as[ClosedSession]
        .collect().toSet
      assert(closed.contains(ClosedSession(1, ts(125), ts(140), 2)))
    } finally q.stop()
  }

  test("in-watermark late event before session start merges and extends " +
    "the start backward") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val out = SessionTracker.track(mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      mem.addData(UserEvent(1, ts(100)))
      q.processAllAvailable() // watermark -> min 70
      mem.addData(UserEvent(1, ts(85))) // late but >= watermark, within gap of start
      q.processAllAvailable()
      mem.addData(UserEvent(1, ts(200))) // closes the extended session
      q.processAllAvailable()
      val closed = spark.table("late_sessions").as[ClosedSession].collect().toSet
      assert(closed.contains(ClosedSession(1, ts(85), ts(100), 2)),
        s"expected backward-extended session, got $closed")
    } finally q.stop()
  }
}

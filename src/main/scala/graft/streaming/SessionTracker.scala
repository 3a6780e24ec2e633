package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the general
  * form behind built-in stateful ops (SURVEY.md §2 Part B "Streaming:
  * stateful ops"). Tracks per-user sessions with an inactivity gap and
  * emits each session exactly once, when it CLOSES (either a newer event
  * arrives past the gap, or the event-time timeout fires after the
  * watermark passes session_end + gap).
  *
  * This is the streaming dual of q31's `session_window` aggregation, with
  * the state machine explicit: state = the open session; output = closed
  * sessions. State is per-key and bounded (one open session per user);
  * at 100 TB-scale key cardinality pair with the RocksDB state store.
  */
object SessionTracker {

  case class UserEvent(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  def track(events: Dataset[UserEvent], gapMinutes: Int)
      (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, it: Iterator[UserEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(ClosedSession(userId, new Timestamp(s.start),
          new Timestamp(s.last), s.n))
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            // forward extension within the gap, OR an in-watermark late
            // event inside/adjacent to the open interval: merge, extending
            // the start backward when needed
            case Some(s) if t >= s.start - gapMs && t - s.last < gapMs =>
              open = Some(s.copy(start = math.min(s.start, t),
                last = math.max(s.last, t), n = s.n + 1))
            case Some(s) if t > s.last =>
              closed += ClosedSession(userId, new Timestamp(s.start),
                new Timestamp(s.last), s.n)
              open = Some(OpenSession(t, t, 1))
            case Some(_) =>
              // late event more than a gap BEFORE the open session: its own
              // already-over session (earlier neighbors have left state;
              // exact retro-merging would need unbounded buffering)
              closed += ClosedSession(userId, new Timestamp(t),
                new Timestamp(t), 1)
            case None =>
              open = Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close via timeout when the watermark passes last + gap
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the stateful-streaming twin of
  * the batch sessionizer (`AggQueries.w8`): per-user sessions close
  * after 30 min of inactivity. State per user is the OPEN session only
  * (bounded: one small struct per active user, evicted by event-time
  * timeout once the watermark passes the gap), so state size tracks
  * concurrently-active users, not history — the shape that survives an
  * unbounded stream.
  *
  * Emission contract (Append mode): a session row is emitted exactly
  * once, when it CLOSES — either a later event arrives past the gap, or
  * the event-time timeout fires after the watermark passes
  * session-end + gap.
  */
object StreamingSessions {

  final case class Click(userId: Long, eventId: Long,
      ts: java.sql.Timestamp)
  final case class SessionState(startUs: Long, endUs: Long, n: Long)
  final case class Session(userId: Long, startUs: Long, endUs: Long,
      nEvents: Long, durationSecs: Long)

  val GapUs: Long = 1800000000L // 30 min, as w8

  def sessions(clicks: Dataset[Click]): Dataset[Session] = {
    val spark = clicks.sparkSession
    import spark.implicits._
    clicks
      .withWatermark("ts", "1 hour")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, events, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.startUs, s.endUs, s.n,
              (s.endUs - s.startUs) / 1000000L))
          } else {
            // within a micro-batch, fold in event-time order (the
            // cross-batch order is the source's block cadence, as in
            // StreamingBalances)
            val sorted = events.toSeq
              .sortBy(e => (e.ts.getTime, e.eventId))
            val out = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              cur match {
                case Some(s) if us - s.endUs <= GapUs =>
                  cur = Some(s.copy(endUs = math.max(s.endUs, us),
                    n = s.n + 1))
                case Some(s) =>
                  out += Session(uid, s.startUs, s.endUs, s.n,
                    (s.endUs - s.startUs) / 1000000L)
                  cur = Some(SessionState(us, us, 1))
                case None => cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // evict once the watermark passes the inactivity gap
              state.setTimeoutTimestamp(s.endUs / 1000L + GapUs / 1000L)
            }
            out.result().iterator
          }
      }
  }

  def run(clicks: Dataset[Click],
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    sessions(clicks).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .start()
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: group a user's events into sessions separated by gaps
  * of more than `gap` time units.
  *
  * Two flavors, mirroring the batch/streaming split of the rest of the
  * engine:
  *  - [[sessions]] — batch gaps-and-islands over any ordered numeric
  *    timestamp column. One shuffle on the user key: the lag/cumsum
  *    windows and the final (user, sid) aggregate all cluster by user
  *    (HashPartitioning(user) satisfies ClusteredDistribution(user, sid)),
  *    so Catalyst plans a single exchange. Per-user state is a sort —
  *    spillable, safe at any user fan-in.
  *  - [[sessionizeStream]] — Structured Streaming
  *    `flatMapGroupsWithState` with an event-time timeout: sessions close
  *    either by an in-batch gap or when the watermark passes the open
  *    session's end + gap. State is one open session per active user —
  *    O(active users), independent of stream length.
  */
object Sessionize {

  /** Batch sessionization. `tsCol` must be a numeric (orderable,
    * subtractable) event time — e.g. epoch micros; `gap` is in the same
    * unit. Output: one row per (user, sid) with start/end/count/sum.
    * `valueCol` is summed as-is — the caller picks the representation
    * (pass integer cents for exact cross-engine money sums; a decimal or
    * double column works too, with that type's usual caveats).
    */
  def sessions(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
               gap: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("sid", sum(col("__new")).over(cum))
      .groupBy(col(userCol), col("sid"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }

  /** One closed session (streaming output row). Times are epoch millis. */
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Long, sum_value: Double)

  /** Open-session state: [startMs, endMs] plus running count/sum. */
  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  /** Streaming sessionization. `events` needs (userCol: long-castable,
    * tsCol: TIMESTAMP — watermark column, valueCol: double-castable).
    * Emits a [[Session]] when it CLOSES: either a same-batch successor
    * event arrives more than `gapMs` later, or the watermark passes
    * `end + gapMs` (event-time timeout). Append output mode.
    */
  def sessionizeStream(events: DataFrame, userCol: String, tsCol: String,
                       valueCol: String, gapMs: Long,
                       watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // cast BEFORE withWatermark: a post-watermark projection would mint a
    // fresh attribute without the watermark tag and fail the event-time-
    // timeout analysis check
    val ds = events
      .select(col(userCol).cast("long").as("__u"),
        col(tsCol).cast("timestamp").as("__ts"),
        col(valueCol).cast("double").as("__v"))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Double)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.end, s.n, s.sum))
          } else {
            // late (pre-watermark) rows were already dropped by Spark;
            // within the batch, order by event time and fold into sessions.
            // Cross-batch arrivals can still be older than the open
            // session: an event within `gapMs` of the open [start, end]
            // interval merges (lowering start if needed); one older than
            // start - gapMs belongs to a DISTINCT earlier session and is
            // emitted as a singleton — an approximation (two such
            // stragglers won't merge with each other) bounded by the
            // watermark delay; keep watermarkDelay ≤ gap to rule it out.
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t > s.end + gapMs =>
                  closed += Session(user, s.start, s.end, s.n, s.sum)
                  cur = Some(OpenSession(t, t, 1L, v))
                case Some(s) if t < s.start - gapMs =>
                  closed += Session(user, t, t, 1L, v)
                case Some(s) =>
                  cur = Some(OpenSession(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1, s.sum + v))
                case None =>
                  cur = Some(OpenSession(t, t, 1L, v))
              }
            }
            cur match {
              case Some(s) if s.end + gapMs <= state.getCurrentWatermarkMs() =>
                // already closeable — emit now; a timeout timestamp in the
                // past would be rejected by the state store
                state.remove()
                closed += Session(user, s.start, s.end, s.n, s.sum)
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + gapMs)
              case None => ()
            }
            closed.iterator
          }
      }
  }
}

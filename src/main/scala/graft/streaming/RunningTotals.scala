package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running totals emitted every micro-batch. */
case class RunningTotal(user_id: Long, n_events: Long, sum_value: Double)

/** Spark 4 `transformWithState` flavor of custom streaming state (the
  * successor API to `flatMapGroupsWithState`, RocksDB-backed, with typed
  * state handles and optional TTL): keeps one `ValueState[(count, sum)]`
  * per user and emits the updated totals for users seen in the batch.
  *
  * Complements [[graft.operators.Sessionize.sessionizeStream]] (the
  * classic API): same state-size story — O(active keys), independent of
  * stream length — with state declared through handles instead of a
  * single opaque case class.
  */
class RunningTotalProcessor extends StatefulProcessor[Long, (Long, Double), RunningTotal] {
  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)]("totals",
      Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                               timerValues: TimerValues): Iterator[RunningTotal] = {
    var (n, s) = if (totals.exists()) totals.get() else (0L, 0.0)
    rows.foreach { case (_, v) => n += 1; s += v }
    totals.update((n, s))
    Iterator.single(RunningTotal(key, n, s))
  }
}

object RunningTotals {
  /** `events` needs (userCol: long-castable, valueCol: double-castable).
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  def runningTotals(events: DataFrame, userCol: String,
                    valueCol: String): Dataset[RunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

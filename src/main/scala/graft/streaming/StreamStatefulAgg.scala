package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful streaming via Spark 4's `transformWithState` —
  * the successor API to `mapGroupsWithState` (which
  * [[StatefulStatusStream]] exercises): typed per-key state handles
  * (ValueState / ListState / MapState), optional per-state TTL, and
  * batch-mode execution of the SAME processor.
  *
  * The operator keeps one running (count, sum, max) aggregate per user
  * and emits the updated row for every key touched by a micro-batch —
  * the "live per-entity dashboard" shape.
  *
  * Scale: state is one fixed-size row per user, hash-partitioned by
  * key across executors, stored in RocksDB (transformWithState
  * requires the RocksDB state store provider — set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider`); a TTL on the state bounds
  * it to recently-active keys, which is what keeps an unbounded user
  * universe from accumulating forever at 100 TB event volume.
  */
object StreamStatefulAgg {

  case class EventIn(user_id: Long, value_cents: Long)
  case class AggState(n_events: Long, total_cents: Long, max_cents: Long)
  case class UserStats(user_id: Long, n_events: Long, total_cents: Long,
      max_cents: Long)

  /** Running per-user aggregate processor; `ttl` bounds how long an
    * idle user's state survives (TTLConfig.NONE = keep forever). */
  class RunningStats(ttl: TTLConfig) extends
      StatefulProcessor[Long, EventIn, UserStats] {

    @transient private var state: ValueState[AggState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AggState](
        "agg", Encoders.product[AggState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[UserStats] = {
      val prev =
        if (state.exists()) state.get() else AggState(0L, 0L, Long.MinValue)
      var n = prev.n_events
      var tot = prev.total_cents
      var mx = prev.max_cents
      rows.foreach { e =>
        n += 1
        tot += e.value_cents
        mx = math.max(mx, e.value_cents)
      }
      val next = AggState(n, tot, mx)
      state.update(next)
      Iterator.single(UserStats(key, n, tot, mx))
    }
  }

  /** Wire the processor over a (possibly streaming) event Dataset.
    * Works unchanged in batch mode — Spark executes the same processor
    * once per key over the full input. A non-NONE `ttl` requires
    * processing-time semantics, so the time mode follows the config
    * (state TTL is rejected under `TimeMode.None`). */
  def runningStats(events: Dataset[EventIn],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningStats(ttl), timeMode, OutputMode.Update())
  }

  case class TopEntry(user_id: Long, rank: Int, value_cents: Long)

  /** Per-key running top-k via [[ListState]] — the other state shape
    * `transformWithState` adds over `mapGroupsWithState`'s single value:
    * the state is the SORTED top-k list itself (at most k longs per
    * key), merged with each batch's arrivals. Emits the key's full
    * current ranking whenever it changes. */
  class RunningTopK(k: Int)
      extends StatefulProcessor[Long, EventIn, TopEntry] {

    @transient private var state: ListState[java.lang.Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getListState[java.lang.Long](
        "topk", Encoders.LONG, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[TopEntry] = {
      val prev = state.get().map(_.longValue()).toArray
      val merged = (prev ++ rows.map(_.value_cents))
        .sorted(Ordering[Long].reverse).take(k)
      if (merged.sameElements(prev)) Iterator.empty
      else {
        state.put(merged.map(java.lang.Long.valueOf))
        merged.iterator.zipWithIndex.map { case (v, i) =>
          TopEntry(key, i + 1, v)
        }
      }
    }
  }

  /** Running per-user top-k of event values (streaming or batch). */
  def runningTopK(events: Dataset[EventIn], k: Int = 3): Dataset[TopEntry] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTopK(k), TimeMode.None(), OutputMode.Update())
  }

  case class TypedEvent(user_id: Long, event_type: String)
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-key sub-keyed counters via [[MapState]] — the third state
    * shape (value / list / map): one RocksDB map per user keyed by
    * event type, point-updated per row (no read-modify-write of a
    * whole collection, which is what keeps wide per-user state cheap
    * at 100 TB event volume). Emits only the types a batch touched. */
  class TypeCounts extends StatefulProcessor[Long, TypedEvent, TypeCount] {

    @transient private var state: MapState[String, java.lang.Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getMapState[String, java.lang.Long](
        "counts", Encoders.STRING, Encoders.LONG, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val prev =
          if (state.containsKey(e.event_type)) state.getValue(e.event_type)
          else java.lang.Long.valueOf(0L)
        state.updateValue(e.event_type, prev + 1L)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(key, t, state.getValue(t)))
    }
  }

  /** Running per-user per-event-type counts (streaming or batch). */
  def runningTypeCounts(events: Dataset[TypedEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeCounts, TimeMode.None(), OutputMode.Update())
  }
}

package graft.streaming

import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.{Dataset, Encoders}

import graft.model.FraudConstants._
import graft.model.Transaction

/** Spark 4 `transformWithState` implementation of the fraud detector —
  * the 1:1 shape match for the reference's Flink state
  * (flink/fraud_detection.py:56-73): three named state slots
  *
  *   - `txs`  : ListState[Long]   recent event-time millis (velocity)
  *   - `loc`  : ValueState[String] last location (travel)
  *   - `time` : ValueState[Long]   last event-time millis (travel)
  *
  * each with a 10-minute TTL (TTLConfig == Flink's StateTtlConfig
  * OnCreateAndWrite: TTL renews on every write). Scoring fold is the same
  * [[FraudScoring.scoreOne]] used by the flatMapGroupsWithState path and
  * the batch window formulation — TwsSpec asserts all agree.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...RocksDBStateStoreProvider`) and TimeMode.ProcessingTime for TTL.
  */
class FraudDetectorProcessor(rapidCount: Int)
    extends StatefulProcessor[String, Transaction, ScoredEvent] {

  @transient private var txState: ListState[Long] = _
  @transient private var locState: ValueState[String] = _
  @transient private var timeState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = TTLConfig(java.time.Duration.ofMillis(StateTtlMs))
    txState = getHandle.getListState[Long]("txs", Encoders.scalaLong, ttl)
    locState = getHandle.getValueState[String]("loc", Encoders.STRING, ttl)
    timeState = getHandle.getValueState[Long]("time", Encoders.scalaLong, ttl)
  }

  override def handleInputRows(
      cardId: String,
      rows: Iterator[Transaction],
      timerValues: TimerValues
  ): Iterator[ScoredEvent] = {
    val out = rows.toSeq
      .map(t => (FraudScoring.parseMillis(t.timestamp), t))
      .sortBy { case (ms, t) => (ms, t.event_id) }
      .map { case (ms, t) =>
        val st = graft.model.CardState(
          if (txState.exists()) txState.get().toList else Nil,
          if (locState.exists()) Some(locState.get()) else None,
          if (timeState.exists()) Some(timeState.get()) else None
        )
        val (score, reasons, next) =
          FraudScoring.scoreOne(st, t.amount, t.location, ms, rapidCount)
        txState.put(next.recentTxMillis.toArray)
        locState.update(t.location)
        timeState.update(ms)
        ScoredEvent(t.event_id, t.card_id, t.amount, t.location, t.ip_address,
          score,
          if (score >= FraudThreshold) "FRAUD" else "LEGIT",
          if (score >= HighSeverityThreshold) "HIGH" else "NONE",
          reasons, t.timestamp, ms)
      }
    out.iterator
  }
}

object FraudStreamTws {
  /** transformWithState twin of [[FraudStream.score]]. */
  def score(
      txs: Dataset[Transaction],
      rapidCount: Int = RapidTxCountV1
  ): Dataset[ScoredEvent] = {
    import txs.sparkSession.implicits._
    txs
      .groupByKey(_.card_id)
      .transformWithState(
        new FraudDetectorProcessor(rapidCount),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}

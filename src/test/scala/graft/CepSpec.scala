package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Transaction
import graft.streaming.Cep

final case class Ev(event_id: Long, user_id: Long, event_type: String, ts_ms: Long)

/** Streaming CEP pattern machine vs the batch lag-window formulation. */
class CepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tx(card: String, ts: String, amount: Double, id: String): Transaction =
    Transaction("1.0", id, s"t-$id", "Alice", card, "amazon", "ECOM",
      amount, "USD", "NY", "1.2.3.4", "NORMAL", ts)

  private val cardTesting = Seq(
    Cep.Step[Transaction]("probe1", _.amount < 5),
    Cep.Step[Transaction]("probe2", _.amount < 5),
    Cep.Step[Transaction]("strike", _.amount > 200))

  private def run(txs: Seq[Transaction]): Seq[Cep.CepMatch] = {
    import spark.implicits._
    Cep.detect[Transaction](
      spark.createDataset(txs),
      key = _.card_id,
      eventId = _.event_id,
      millis = t => graft.streaming.FraudScoring.parseMillis(t.timestamp),
      steps = cardTesting,
      withinMs = 60000L
    ).collect().toSeq
  }

  test("card-testing pattern: two micro-probes then a large charge") {
    val m = run(Seq(
      tx("c1", "2024-01-01T00:00:00Z", 2.0, "a"),
      tx("c1", "2024-01-01T00:00:10Z", 3.0, "b"),
      tx("c1", "2024-01-01T00:00:20Z", 250.0, "c")))
    assert(m.map(_.step_events) == Seq(Seq("a", "b", "c")))
    assert(m.head.start_millis + 20000 == m.head.end_millis)
  }

  test("strict contiguity: an interleaved normal event breaks the pattern") {
    val m = run(Seq(
      tx("c1", "2024-01-01T00:00:00Z", 2.0, "a"),
      tx("c1", "2024-01-01T00:00:10Z", 50.0, "x"), // breaks
      tx("c1", "2024-01-01T00:00:20Z", 3.0, "b"),
      tx("c1", "2024-01-01T00:00:30Z", 250.0, "c")))
    assert(m.isEmpty)
  }

  test("time bound: pattern spanning more than withinMs restarts") {
    val m = run(Seq(
      tx("c1", "2024-01-01T00:00:00Z", 2.0, "a"),
      tx("c1", "2024-01-01T00:00:30Z", 3.0, "b"),
      tx("c1", "2024-01-01T00:02:00Z", 250.0, "c"))) // 120 s > 60 s
    assert(m.isEmpty)
  }

  test("matches do not overlap and keys are independent") {
    val m = run(Seq(
      tx("c1", "2024-01-01T00:00:00Z", 2.0, "a"),
      tx("c1", "2024-01-01T00:00:05Z", 3.0, "b"),
      tx("c1", "2024-01-01T00:00:10Z", 250.0, "c"),
      tx("c1", "2024-01-01T00:00:15Z", 1.0, "d"),
      tx("c1", "2024-01-01T00:00:20Z", 2.0, "e"),
      tx("c1", "2024-01-01T00:00:25Z", 300.0, "f"),
      tx("c2", "2024-01-01T00:00:00Z", 2.0, "g")))
    assert(m.map(_.step_events).toSet == Set(Seq("a", "b", "c"), Seq("d", "e", "f")))
    assert(m.forall(_.key == "c1"))
  }

  test("state hygiene: only mid-pattern keys hold state (idle keys store nothing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Transaction]
    // c1 starts the pattern (one micro-probe, mid-pattern); c2 and c3 see
    // only normal amounts (machine stays at step 0 → no stored state)
    in.addData(
      tx("c1", "2024-01-01T00:00:00Z", 2.0, "a"),
      tx("c2", "2024-01-01T00:00:00Z", 50.0, "x"),
      tx("c3", "2024-01-01T00:00:00Z", 60.0, "y"),
      tx("c3", "2024-01-01T00:00:05Z", 70.0, "z"))
    val q = Cep.detect[Transaction](
      in.toDS(),
      key = _.card_id,
      eventId = _.event_id,
      millis = t => graft.streaming.FraudScoring.parseMillis(t.timestamp),
      steps = cardTesting,
      withinMs = 60000L
    ).writeStream.format("memory").queryName("cep_state_hygiene")
      .outputMode("append").trigger(Trigger.Once()).start()
    q.awaitTermination()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    assert(stateRows == 1L, s"expected state only for c1, got $stateRows rows")
  }

  test("streaming 2-step pattern agrees with the batch lag-window query on events") {
    import org.apache.spark.sql.functions.col
    val sf = TestSpark.sf0001
    val batch = graft.operators.AnalyticsExt.queries("cep_signup_purchase")(spark, sf)
      .select("user_id", "end_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // streaming machine over the same rows
    val ev = graft.sources.Tables.eventsNormalized(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
    import spark.implicits._
    val matches = Cep.detect[Ev](
      ev.as[Ev],
      key = _.user_id.toString,
      eventId = e => f"${e.ts_ms}%020d-${e.event_id}",
      millis = _.ts_ms,
      steps = Seq(
        Cep.Step[Ev]("signup", _.event_type == "signup"),
        Cep.Step[Ev]("purchase", _.event_type == "purchase")),
      withinMs = 3600000L
    ).collect().map(m => (m.key.toLong, m.end_millis)).toSet
    assert(matches == batch, s"stream-only=${matches -- batch}, batch-only=${batch -- matches}")
  }
}

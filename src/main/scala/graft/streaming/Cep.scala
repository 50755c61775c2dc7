package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** CEP-style sequence detection over keyed event streams — the operator
  * the reference ships as an unused flink-cep jar (SURVEY.md §2 X2,
  * README.md:129 "future work"). Spark has no CEP primitive, so this is a
  * pattern state machine inside `flatMapGroupsWithState` (the §7.3
  * decision): strict contiguity, time-bounded, non-overlapping matches
  * (after a match the machine resets — Flink's `skip past last event`
  * strategy).
  *
  * Batch dual for 2-step patterns: a lag-window query
  * (Analytics `cep_signup_purchase`) — CepSpec asserts both agree.
  */
object Cep {

  /** Processing-time TTL = this × the event-time pattern window: the
    * operator's tolerated processing lag before mid-pattern state is
    * reclaimed (see [[detect]]'s scaladoc).
    */
  val TtlMarginFactor = 10L

  /** One step of a pattern: a name + predicate over the event. */
  final case class Step[E](name: String, pred: E => Boolean)

  final case class CepMatch(
      key: String,
      step_events: Seq[String],
      start_millis: Long,
      end_millis: Long
  )

  final case class CepState(
      stepIdx: Int,
      eventIds: List[String],
      startMillis: Long
  )

  /** Detect `steps` in strict contiguity within `withinMs` per key.
    *
    * State hygiene for unbounded key spaces (the 100 TB/day stream shape):
    * a key whose machine is at step 0 stores NO state (an empty machine is
    * indistinguishable from no machine), and mid-pattern state carries a
    * processing-time TTL of `TtlMarginFactor × withinMs`. The pattern
    * window itself is event-time (`ms - startMillis`), so a
    * processing-time TTL is only a cleanup heuristic: it is safe exactly
    * when processing time roughly tracks event time. The 10× margin keeps
    * state alive through transient lag (backlog replay, earliest-offset
    * catch-up); a continuation that arrives more than 10× the pattern
    * window late in processing time is abandoned — that lag bound is this
    * operator's documented assumption. Both mirror FraudStream.score's
    * TTL handling; without them, per-key state accumulates forever.
    *
    * @param events   keyed event stream/dataset
    * @param key      grouping key (card/user)
    * @param eventId  id extractor (for match provenance)
    * @param millis   event-time extractor
    * @param steps    ordered pattern steps (length ≥ 2)
    * @param withinMs max span from first to last matched event
    */
  def detect[E](
      events: Dataset[E],
      key: E => String,
      eventId: E => String,
      millis: E => Long,
      steps: Seq[Step[E]],
      withinMs: Long
  ): Dataset[CepMatch] = {
    require(steps.size >= 2, "a sequence pattern needs at least 2 steps")
    implicit val matchEnc: Encoder[CepMatch] = Encoders.product[CepMatch]
    implicit val stateEnc: Encoder[CepState] = Encoders.product[CepState]
    implicit val strEnc: Encoder[String] = Encoders.STRING

    events
      .groupByKey(key)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (k: String, it: Iterator[E], state: GroupState[CepState]) =>
          if (state.hasTimedOut) {
            // mid-pattern state idle past the pattern window: can never
            // complete a match — drop it, emit nothing.
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(CepState(0, Nil, 0L))
            val out = scala.collection.mutable.ListBuffer.empty[CepMatch]

            def tryStart(e: E, ms: Long): CepState =
              if (steps.head.pred(e)) CepState(1, List(eventId(e)), ms)
              else CepState(0, Nil, 0L)

            it.toSeq
              .map(e => (millis(e), eventId(e), e))
              .sortBy { case (ms, id, _) => (ms, id) }
              .foreach { case (ms, _, e) =>
                st =
                  if (st.stepIdx == 0) tryStart(e, ms)
                  else if (ms - st.startMillis > withinMs) tryStart(e, ms)
                  else if (steps(st.stepIdx).pred(e)) {
                    val next = CepState(st.stepIdx + 1, st.eventIds :+ eventId(e), st.startMillis)
                    if (next.stepIdx == steps.size) {
                      out += CepMatch(k, next.eventIds, next.startMillis, ms)
                      CepState(0, Nil, 0L) // skip past last event
                    } else next
                  } else tryStart(e, ms) // strict contiguity broken: restart
              }
            if (st.stepIdx == 0) {
              // empty machine ≡ no machine: never store it
              if (state.exists) state.remove()
            } else {
              state.update(st)
              state.setTimeoutDuration(math.max(TtlMarginFactor * withinMs, 1000L))
            }
            out.iterator
          }
      }
  }
}

package graft.service

import graft.envelope.EventMeta
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** F1: retry-with-backoff execution — the port of the reference's retry
  * stage (reference: KafkaBus.scala:186-240 `statefulMapConcat` with
  * `retryState: HashMap[eventId -> (attempt, RetryPolicy)]`; TestBus
  * duplicate at TestBus.scala:106-161).
  *
  * Differences from the reference, by design (SURVEY.md §7.4):
  *  - the reference's 16-slot dropHead feedback buffer is lossy under
  *    overload; this port never silently drops — give-ups surface as
  *    explicit error rows (the reference commits-and-drops, emitting only
  *    a trace).
  *  - batch retries run inline (bounded sleep); streaming retries are
  *    cross-trigger via keyed state + processing-time timeout, the
  *    GroupState analog of the reference's scheduler re-offer
  *    (KafkaBus.scala:229-233).
  *
  * Scale: the streaming state is keyed by eventId and holds only
  * currently-failing events — size ≈ (failure rate) × (retry horizon),
  * independent of throughput; the state store shards it like any keyed
  * state (the analog of the reference's per-consumer HashMap, but
  * fault-tolerant under checkpointing).
  */
object RetryFlow {

  /** Outcome of a handled event: exactly one of `ok`/`err` is set;
    * `attempts` counts handler invocations (1 = first try succeeded).
    */
  final case class Attempt[U](ok: Option[U], err: Option[String], attempts: Int)

  /** Keyed retry state: the pending event + how often it was tried
    * (the reference's `retryState` entry, KafkaBus.scala:206).
    */
  final case class RetryState[T](t: T, meta: EventMeta, attempt: Int)

  /** In-batch retry: invoke `f` up to `1 + policy.numRetry` times per
    * event, sleeping the backoff schedule between tries (capped so a
    * misconfigured policy cannot stall an executor core for minutes).
    */
  def inBatch[T, U](in: Dataset[(T, EventMeta)], policy: RetryPolicy,
                    maxSleepMillis: Long = 10000L)(f: (T, EventMeta) => U)
                   (implicit encA: Encoder[Attempt[U]]): Dataset[(Attempt[U], EventMeta)] = {
    implicit val metaEnc: Encoder[EventMeta] = Encoders.product[EventMeta]
    implicit val outEnc: Encoder[(Attempt[U], EventMeta)] = Encoders.tuple(encA, metaEnc)
    in.map { case (t, m) =>
      var attempt = 0
      var ok: Option[U] = None
      var err: Option[String] = None
      while (ok.isEmpty && attempt <= policy.numRetry) {
        if (attempt > 0)
          Thread.sleep(math.min(policy.delayFor(attempt).toMillis, maxSleepMillis))
        attempt += 1
        try { ok = Some(f(t, m)); err = None }
        catch { case e: Throwable => err = Some(e.toString) }
      }
      (Attempt(ok, if (ok.isEmpty) err else None, attempts = attempt), m)
    }
  }

  /** Cross-trigger streaming retry: failed events park in keyed state and
    * re-fire on a processing-time timeout after the backoff delay — the
    * exact shape of the reference's scheduler re-offer into the retry
    * queue (KafkaBus.scala:229-233), minus the lossy buffer.
    *
    * Emits an Attempt row when an event finally succeeds or exhausts its
    * retries; in-flight retries emit nothing (OutputMode must be Append).
    *
    * NOTE: pending processing-time timeouts keep the query scheduling
    * micro-batches, so `StreamingQuery.processAllAvailable()` may block
    * indefinitely — poll the sink instead.
    */
  def streaming[T, U](in: Dataset[(T, EventMeta)], policy: RetryPolicy)
                     (f: (T, EventMeta) => U)
                     (implicit encState: Encoder[RetryState[T]],
                      encA: Encoder[Attempt[U]]): Dataset[(Attempt[U], EventMeta)] = {
    implicit val metaEnc: Encoder[EventMeta] = Encoders.product[EventMeta]
    implicit val outEnc: Encoder[(Attempt[U], EventMeta)] = Encoders.tuple(encA, metaEnc)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    in.groupByKey(_._2.eventId)
      .flatMapGroupsWithState[RetryState[T], (Attempt[U], EventMeta)](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (id: String, events: Iterator[(T, EventMeta)], state: GroupState[RetryState[T]]) =>
          def tryOnce(t: T, m: EventMeta, attempt: Int): Option[(Attempt[U], EventMeta)] =
            try {
              val u = f(t, m)
              if (state.exists) state.remove()
              Some((Attempt(Some(u), None, attempt), m))
            } catch {
              case e: Throwable =>
                if (attempt <= policy.numRetry) {
                  state.update(RetryState(t, m, attempt))
                  state.setTimeoutDuration(policy.delayFor(attempt).toMillis.max(1L))
                  None // parked; the timeout re-offers it
                } else {
                  if (state.exists) state.remove()
                  Some((Attempt(None, Some(e.toString), attempt), m))
                }
            }
          if (state.hasTimedOut) {
            val st = state.get
            tryOnce(st.t, st.meta, st.attempt + 1).iterator
          } else {
            events.flatMap { case (t, m) => tryOnce(t, m, 1) }
          }
      }
  }
}

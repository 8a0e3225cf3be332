package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T2/T3 (SURVEY §2.9): raw wire events → normalized events with a monotonic
  * per-session `seq`, game_id carry-forward, and a validated phase machine.
  *
  * Reference: `src/foundation/normalizer.py:51-84` (seq assignment + game_id
  * carry), `normalizer.py:143-162` + `src/sources/game_state_machine.py:51-177`
  * (phase detection + legal-transition validation).
  *
  * Spark shape: `groupByKey(session_id).flatMapGroupsWithState` — the state
  * (next seq, last game_id, phase) lives in the state store, checkpointed
  * with the query, so the operator scales horizontally by session key and
  * recovers exactly-once. Events inside a micro-batch group are sorted by
  * (ts, event order) before folding — the reference's single-threaded bus
  * delivers in order; under distribution the sort restores per-batch order
  * (cross-batch disorder is bounded by the source's watermark, T13).
  */
object Normalizer {

  /** Idle-session eviction horizon: a session whose events fall this far
    * behind the watermark has its state dropped (unbounded keyed state
    * otherwise grows forever in a long-running stream). A session resuming
    * later restarts at seq 0 in Cooldown — the same cold-start the
    * reference performs when its in-memory session map is recycled.
    */
  val SessionIdleTimeoutMs: Long = 30 * 60 * 1000L

  /** Max event-time disorder the stream tolerates before state eviction
    * may discard a session (T13 horizon).
    */
  val WatermarkDelay = "10 minutes"

  def normalizeGroup(evict: Boolean)(
      sessionId: String,
      events: Iterator[RawEvent],
      state: GroupState[SessionState]): Iterator[NormalizedEvent] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption.getOrElse(SessionState(0L, None, Phases.Cooldown))
    val out = events.toSeq.sortBy(e => (e.ts.getTime, e.event_name)).map { e =>
      val gameId = e.game_id.orElse(st.lastGameId)
      val (phase, valid) = Phases.proposed(e.event_name) match {
        case Some(p) if Phases.legal(st.phase).contains(p) => (p, true)
        case Some(_) => (st.phase, false) // illegal transition: keep, flag
        case None => (st.phase, true)     // no phase evidence
      }
      val n = NormalizedEvent(sessionId, st.nextSeq, e.ts, e.event_name,
        gameId, phase, valid, e.tick, e.price, e.raw_json)
      st = SessionState(st.nextSeq + 1, gameId, phase)
      n
    }
    state.update(st)
    // event-time eviction: the deadline is TTL past the newest event this
    // session has produced (floored at the watermark — in the first batch
    // the watermark is still 0, and a deadline anchored there would expire
    // the moment real 2020s timestamps advance it). A processing-time
    // timeout is not an option: shouldRunAnotherBatch is always true under
    // it, hot-looping the no-data re-trigger.
    if (evict) {
      val newestMs = out.lastOption.map(_.ts.getTime).getOrElse(0L)
      state.setTimeoutTimestamp(
        math.max(newestMs, state.getCurrentWatermarkMs()) + SessionIdleTimeoutMs)
    }
    out.iterator
  }

  /** Works on both a streaming and a batch Dataset. Streaming adds a
    * watermark and evicts idle-session state past the timeout horizon;
    * batch state dies with the job, so eviction is skipped (NoTimeout).
    */
  def normalize(raw: Dataset[RawEvent]): Dataset[NormalizedEvent] = {
    val spark: SparkSession = raw.sparkSession
    import spark.implicits._
    if (raw.isStreaming)
      raw.withWatermark("ts", WatermarkDelay)
        .groupByKey(_.session_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(normalizeGroup(evict = true))
    else
      raw.groupByKey(_.session_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(normalizeGroup(evict = false))
  }
}

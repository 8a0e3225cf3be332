package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import IntegrityMonitor._

/** Deterministic batch folds of the two feed-health state machines,
  * modeled line-by-line on the reference semantics
  * (data_integrity_monitor.py / feed_degradation.py — see Scaladoc).
  */
class IntegrityMonitorSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def fe(sec: Long, kind: String, game: String = null,
      tick: Int = -1, clean: Boolean = true) =
    FeedEvent("s1", ts(sec), kind, game, tick, clean)

  test("tick gaps accumulate to the TICKS threshold; sequential tick resets") {
    val events = Seq(
      fe(1, "game_start", "g1"),
      fe(2, "tick", tick = 0), fe(3, "tick", tick = 1),
      fe(4, "tick", tick = 5), // gap of 3 (expected 2)
      fe(5, "tick", tick = 6), // sequential -> RESET
      fe(6, "tick", tick = 10), // gap of 3
      fe(7, "tick", tick = 13), // gap of 2 -> 5 accumulated -> trigger
      fe(8, "game_end", "g1", clean = true)) // clean game -> recover
      .toDS()
    val sig = IntegrityMonitor.monitor(events, ThresholdTicks, 5)
      .collect().sortBy(_.ts.getTime)
    assert(sig.map(_.issue).toSeq ===
      Seq("tick_gap", "tick_gap", "tick_gap", "recovered"))
    assert(sig.map(_.triggered).toSeq === Seq(false, false, true, false))
    assert(sig(1).consecutive_tick_gaps === 3) // post-reset re-accumulation
    assert(sig(2).consecutive_tick_gaps === 5)
  }

  test("game_start resets tick tracking across games (no phantom gap)") {
    val events = Seq(
      fe(1, "game_start", "g1"), fe(2, "tick", tick = 97), fe(3, "tick", tick = 98),
      fe(4, "game_end", "g1", clean = true),
      fe(5, "game_start", "g2"), fe(6, "tick", tick = 0), fe(7, "tick", tick = 1))
      .toDS()
    assert(IntegrityMonitor.monitor(events, ThresholdTicks, 5).count() === 0)
  }

  test("GAMES threshold: consecutive bad games trigger; clean resets count") {
    val events = Seq(
      fe(1, "game_end", "g1", clean = false),
      fe(2, "game_end", "g2", clean = false),
      fe(3, "game_end", "g3", clean = true), // resets counter
      fe(4, "game_end", "g4", clean = false),
      fe(5, "game_end", "g5", clean = false),
      fe(6, "game_end", "g6", clean = false), // 3 consecutive -> trigger
      fe(7, "game_end", "g7", clean = true)) // recover
      .toDS()
    val sig = IntegrityMonitor.monitor(events, ThresholdGames, 3)
      .collect().sortBy(_.ts.getTime)
    val trig = sig.filter(_.issue == "abnormal_game_end")
    assert(trig.map(_.consecutive_bad_games).toSeq === Seq(1, 2, 1, 2, 3))
    assert(trig.map(_.triggered).toSeq === Seq(false, false, false, false, true))
    assert(sig.last.issue === "recovered" && !sig.last.triggered)
  }

  test("connection loss triggers immediately; restore alone does NOT recover") {
    val events = Seq(
      fe(1, "tick", tick = 0),
      fe(2, "connection_lost"),
      fe(3, "connection_restored"),
      fe(4, "game_end", "g1", clean = true)) // only a clean game recovers
      .toDS()
    val sig = IntegrityMonitor.monitor(events, ThresholdTicks, 5)
      .collect().sortBy(_.ts.getTime)
    assert(sig.map(_.issue).toSeq === Seq("connection_lost", "recovered"))
    assert(sig.head.ts === ts(2) && sig.last.ts === ts(4))
  }

  test("sessions are independent state shards") {
    val events = Seq(
      FeedEvent("a", ts(1), "connection_lost", null, -1, true),
      FeedEvent("b", ts(2), "tick", null, 0, true),
      FeedEvent("b", ts(3), "tick", null, 1, true)).toDS()
    val sig = IntegrityMonitor.monitor(events, ThresholdTicks, 5).collect()
    assert(sig.length === 1 && sig.head.session_id === "a")
  }

  private def he(sec: Long, kind: String) = HealthEvent("s1", ts(sec), kind)

  test("degradation ladder: errors -> DEGRADED -> MINIMAL; spikes -> DEGRADED") {
    val errs = (1L to 20L).map(i => he(i, "error")).toDS()
    val modes = IntegrityMonitor.degradation(errs, errorThreshold = 10,
      spikeThreshold = 5, recoveryWindowMs = 60000)
      .collect().sortBy(_.ts.getTime)
    assert(modes.map(m => (m.mode, m.errors_in_window)).toSeq ===
      Seq((Degraded, 10), (Minimal, 20)))
    val spikes = (1L to 5L).map(i => he(i, "spike")).toDS()
    val m2 = IntegrityMonitor.degradation(spikes).collect()
    assert(m2.map(_.mode).toSeq === Seq(Degraded) && m2.head.spikes_in_window === 5)
  }

  test("disconnect is sticky OFFLINE; reconnect lands DEGRADED; quiet window recovers NORMAL") {
    val events = Seq(
      he(1, "error"), he(2, "disconnect"),
      he(3, "error"), // counts, but mode stays OFFLINE (sticky)
      he(10, "reconnect"), // -> DEGRADED
      he(80, "heartbeat")) // 70 s quiet > 60 s window -> NORMAL
      .toDS()
    val modes = IntegrityMonitor.degradation(events, errorThreshold = 2,
      spikeThreshold = 5, recoveryWindowMs = 60000)
      .collect().sortBy(_.ts.getTime)
    assert(modes.map(_.mode).toSeq === Seq(Offline, Degraded, Normal))
    assert(modes.last.errors_in_window === 0, "recovery clears counters")
  }

  test("issue rows keep flowing while already triggered") {
    val events = Seq(
      fe(1, "game_start", "g1"),
      fe(2, "tick", tick = 0),
      fe(3, "tick", tick = 4), // gap 3 -> trigger (threshold 3)
      fe(4, "tick", tick = 8), // gap 3 while triggered -> still an issue row
      fe(5, "game_end", "g1", clean = false), // bad game while triggered too
      fe(6, "game_start", "g2"),
      fe(7, "game_end", "g2", clean = true)) // recover
      .toDS()
    val sig = IntegrityMonitor.monitor(events, ThresholdTicks, 3)
      .collect().sortBy(_.ts.getTime)
    assert(sig.map(_.issue).toSeq ===
      Seq("tick_gap", "tick_gap", "abnormal_game_end", "recovered"))
    assert(sig.map(_.triggered).toSeq === Seq(true, true, true, false))
    assert(sig(1).consecutive_tick_gaps === 6)
  }

  test("isolated errors separated by quiet windows never accumulate to DEGRADED") {
    // one error every 70 s (> the 60 s recovery window), errorThreshold of
    // them: the windowed counter must clear during each quiet gap even
    // though the mode never left NORMAL
    val events = (0L until 10L).map(i => he(1 + i * 70, "error")).toDS()
    assert(IntegrityMonitor.degradation(events, errorThreshold = 10,
      spikeThreshold = 5, recoveryWindowMs = 60000).count() === 0)
  }

  test("recovery is event-time: replaying the same events reproduces modes") {
    val events = Seq(he(1, "error"), he(2, "error"), he(100, "heartbeat")).toDS()
    def run() = IntegrityMonitor.degradation(events, errorThreshold = 2,
      spikeThreshold = 5, recoveryWindowMs = 60000)
      .collect().sortBy(_.ts.getTime).map(m => (m.ts.getTime, m.mode)).toSeq
    assert(run() === run())
    assert(run() === Seq((2000L, Degraded), (100000L, Normal)))
  }
}

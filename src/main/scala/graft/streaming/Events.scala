package graft.streaming

import java.sql.Timestamp

/** Typed stream-side models (SURVEY §1.4).
  *
  * Mirrors the reference's normalized event dataclasses
  * (`src/foundation/events.py:10-335`, `src/foundation/normalizer.py:37-45`)
  * as Spark-encodable case classes: a raw wire event in, a normalized event
  * (monotonic per-session seq, carried game_id, validated phase) out.
  */
final case class RawEvent(
    session_id: String,
    ts: Timestamp,
    event_name: String,
    game_id: Option[String],
    tick: Option[Int],
    price: Option[Double],
    raw_json: String)

final case class NormalizedEvent(
    session_id: String,
    seq: Long,
    ts: Timestamp,
    event_name: String,
    game_id: Option[String],
    phase: String,
    phase_valid: Boolean,
    tick: Option[Int],
    price: Option[Double],
    raw_json: String)

/** Per-session normalizer state carried across micro-batches:
  * next seq to assign (`normalizer.py:64-65`), last seen game_id
  * (`normalizer.py:70-76` carry-forward), current phase
  * (`normalizer.py:143-162`).
  */
final case class SessionState(
    nextSeq: Long,
    lastGameId: Option[String],
    phase: String)

/** Game phases + legal transitions (`src/sources/game_state_machine.py:51-177`):
  * COOLDOWN → PRESALE → ACTIVE → RUGGED → COOLDOWN, with self-loops legal.
  */
object Phases {
  val Cooldown = "COOLDOWN"
  val Presale = "PRESALE"
  val Active = "ACTIVE"
  val Rugged = "RUGGED"

  val legal: Map[String, Set[String]] = Map(
    Cooldown -> Set(Cooldown, Presale),
    Presale -> Set(Presale, Active),
    Active -> Set(Active, Rugged),
    Rugged -> Set(Rugged, Cooldown))

  /** Phase proposed by an event name, if any (normalizer.py:143-162 maps
    * wire events to phase evidence; tick events imply ACTIVE).
    */
  def proposed(eventName: String): Option[String] = eventName match {
    case "game.cooldown" => Some(Cooldown)
    case "game.presale" => Some(Presale)
    case "game.tick" | "game.active" => Some(Active)
    case "game.rug" => Some(Rugged)
    case _ => None
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SocketFramesSpec extends SparkSpec {

  import spark.implicits._

  private def sig(gameId: String, active: Boolean, rugged: Boolean,
      tick: Int, price: Double, cooldown: Long = 0L,
      preRound: Boolean = false): String =
    s"""{"gameId":"$gameId","active":$active,"rugged":$rugged,""" +
      s""""tickCount":$tick,"price":$price,"cooldownTimer":$cooldown,""" +
      s""""allowPreRoundBuys":$preRound,"tradeCount":0}"""

  test("frame grammar: engine/socketio types, namespace, ack id, trace wrapper") {
    val frames = Seq(
      "2",                                        // ping
      "3",                                        // pong
      """0{"sid":"abc"}""",                       // engine connect
      "40",                                       // sio connect
      "41",                                       // sio disconnect
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = false, 5, 1.25)}]""",
      s"""42/game,17["gameStateUpdate",${sig("g2", active = true, rugged = false, 9, 2.0)}]""",
      s"""42["gameStateUpdate",{"__trace":"t","traceparent":"00-x"},${sig("g3", active = true, rugged = false, 3, 1.1)}]""",
      """42["playerUpdate",{"id":"p1"}]""",
      "431[]",                                    // ack
      "9zzz",                                     // garbage engine type
      "4x",                                       // garbage sio type
      "").toDF("value")
    val parsed = SocketFrames.parseFrames(frames).collect()
    def row(i: Int) = parsed(i)
    assert(row(0).getAs[String]("frame_type") === "ping")
    assert(row(1).getAs[String]("frame_type") === "pong")
    assert(row(2).getAs[String]("frame_type") === "connect")
    assert(row(3).getAs[String]("frame_type") === "connect")
    assert(row(4).getAs[String]("frame_type") === "disconnect")
    assert(row(5).getAs[String]("frame_type") === "event")
    assert(row(5).getAs[String]("event_name") === "gameStateUpdate")
    assert(row(6).getAs[String]("event_name") === "gameStateUpdate") // namespace+ack
    assert(row(6).getAs[String]("payload_json").contains("\"g2\""))
    // traced format: data is the THIRD array element
    assert(row(7).getAs[String]("payload_json").contains("\"g3\""))
    assert(!row(7).getAs[String]("payload_json").contains("traceparent"))
    assert(row(8).getAs[String]("event_name") === "playerUpdate")
    assert(row(9).getAs[String]("frame_type") === "ack")
    assert(row(10).getAs[String]("frame_type") === null)
    assert(row(11).getAs[String]("frame_type") === null)
    assert(row(12).getAs[String]("frame_type") === null)
  }

  test("gameStateUpdate signals map to phase-evidence RawEvents") {
    val frames = Seq(
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = false, 0, 1.0)}]""",   // game start
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = false, 7, 1.4)}]""",   // tick
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = true, 8, 0.0)}]""",    // rug reveal
      s"""42["gameStateUpdate",${sig("g1", active = false, rugged = true, 8, 0.0, cooldown = 15000)}]""",  // cooldown
      s"""42["gameStateUpdate",${sig("", active = false, rugged = false, 0, 1.0, cooldown = 5000, preRound = true)}]""", // presale
      "2", // ping: dropped
      """42["playerUpdate",{"id":"p1"}]""" // other event: dropped
    ).toDF("value")
    val raw = SocketFrames.rawEvents(frames, lit("conn-1"),
      lit("2024-01-01 00:00:00").cast("timestamp")).collect()
    assert(raw.length === 5)
    assert(raw.map(_.event_name).toSeq === Seq(
      "game.active", "game.tick", "game.rug", "game.cooldown", "game.presale"))
    assert(raw(1).tick === Some(7))
    assert(raw(1).price === Some(1.4))
    assert(raw(1).game_id === Some("g1"))
    assert(raw.forall(_.session_id == "conn-1"))
  }

  test("parsed raw events flow through the normalizer (T1->T4 live path)") {
    val frames = Seq(
      s"""42["gameStateUpdate",${sig("", active = false, rugged = false, 0, 1.0, cooldown = 5000, preRound = true)}]""",
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = false, 1, 1.02)}]""",
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = false, 2, 1.07)}]""",
      s"""42["gameStateUpdate",${sig("g1", active = true, rugged = true, 3, 0.0)}]"""
    ).toDF("value")
    // one arrival timestamp per frame keeps the batch fold ordered
    val ordered = frames.withColumn("value", col("value"))
    val raw = SocketFrames.rawEvents(ordered, lit("conn-1"),
      (lit(1700000000L) + monotonically_increasing_id()).cast("timestamp"))
    val out = Normalizer.normalize(raw).collect().sortBy(_.seq)
    assert(out.map(_.phase).toSeq === Seq("PRESALE", "ACTIVE", "ACTIVE", "RUGGED"))
    assert(out.forall(_.phase_valid))
    // game_id carried forward from the first g1 frame onward
    assert(out.drop(1).forall(_.game_id.contains("g1")))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S10 — socket-protocol frame parser
  * (`src/sources/socketio_parser.py:44-186`, `websocket_feed.py:263-408`):
  * the live feed arrives as Engine.IO/Socket.IO text frames
  * (`<engine-type>[<sio-type>][/namespace,][ackId][json-array]`); the
  * reference parses them with a Python loop per frame. Here the grammar is
  * pure column expressions over any text stream — `spark.readStream
  * .format("socket")` (whose schema is exactly one `value` string column),
  * a file/Kafka stream of captured frames, or a batch replay — so parsing
  * is codegen'd and scales with the stream, and the SAME code closes the
  * live path T1→T4: frames → RawEvent → Normalizer → partitioned sink.
  */
object SocketFrames {

  /** gameStateUpdate signal fields the reference extracts
    * (`websocket_feed.py:392-408` — the "9 signal fields").
    */
  val SignalSchema: StructType = StructType(Seq(
    StructField("gameId", StringType),
    StructField("active", BooleanType),
    StructField("rugged", BooleanType),
    StructField("tickCount", IntegerType),
    StructField("price", DoubleType),
    StructField("cooldownTimer", LongType),
    StructField("allowPreRoundBuys", BooleanType),
    StructField("tradeCount", IntegerType)))

  /** Classify frames and extract the event payload. Input: one string
    * column `value`. Output adds:
    *   - `frame_type`: ping/pong/connect/disconnect/upgrade/noop for
    *     engine-level frames; event/ack/error/binary_event/binary_ack for
    *     message ("4x") frames; NULL for garbage
    *   - `event_name`: first element of the event's JSON array
    *   - `payload_json`: the event's data element — the traced wire format
    *     `42["ev", {__trace...}, {data}]` carries it in [2], the standard
    *     one in [1] (`socketio_parser.py:163-177`)
    */
  def parseFrames(frames: DataFrame): DataFrame = {
    val v = trim(col("value"))
    val engine = substring(v, 1, 1)
    val sio = substring(v, 2, 1)
    // strip optional namespace ("/ns,") and ack-id digits; keep the array
    val arr = regexp_extract(v, "^4[25](?:/[^,]*+,)?+[0-9]*+(\\[.*\\])$", 1)
    val traced =
      get_json_object(arr, "$[1].__trace").isNotNull ||
        get_json_object(arr, "$[1].traceparent").isNotNull
    val payload = when(length(arr) > 0,
      when(traced, get_json_object(arr, "$[2]"))
        .otherwise(get_json_object(arr, "$[1]")))
    val frameType =
      when(engine === "0", "connect")
        .when(engine === "1", "disconnect")
        .when(engine === "2", "ping")
        .when(engine === "3", "pong")
        .when(engine === "5", "upgrade")
        .when(engine === "6", "noop")
        .when(engine === "4",
          when(sio === "0", "connect")
            .when(sio === "1", "disconnect")
            .when(sio === "2", "event")
            .when(sio === "3", "ack")
            .when(sio === "4", "error")
            .when(sio === "5", "binary_event")
            .when(sio === "6", "binary_ack"))
    frames
      .withColumn("frame_type", frameType)
      .withColumn("event_name",
        when(frameType === "event", get_json_object(arr, "$[0]")))
      .withColumn("payload_json",
        when(frameType === "event", payload))
  }

  /** Phase evidence from the 9-field signal, the state machine's predicate
    * order (`game_state_machine.py:90-128`): rug (active && rugged) wins,
    * then post-rug cooldown, then presale (short cooldown + pre-round buys
    * open), then active tick / game start.
    */
  private def wireEventName(s: Column): Column =
    when(s("active") && s("rugged"), "game.rug")
      .when(!s("active") && s("rugged") && s("cooldownTimer") > 10000, "game.cooldown")
      .when(s("cooldownTimer") > 0 && s("cooldownTimer") <= 10000 &&
        s("allowPreRoundBuys"), "game.presale")
      .when(s("active") && !s("rugged") && s("tickCount") > 0, "game.tick")
      .when(s("active") && !s("rugged") && s("tickCount") === 0, "game.active")
      .otherwise("ws.event")

  /** gameStateUpdate frames → [[RawEvent]]s ready for
    * [[Normalizer.normalize]]. `sessionId`/`ts` come from the transport
    * (socket connection id, arrival time); non-event frames and other
    * event names are dropped here — they carry no game evidence.
    */
  def rawEvents(frames: DataFrame, sessionId: Column, ts: Column): Dataset[RawEvent] = {
    val spark = frames.sparkSession
    import spark.implicits._
    val parsed = parseFrames(frames)
      .filter(col("frame_type") === "event" &&
        col("event_name") === "gameStateUpdate" && col("payload_json").isNotNull)
      .withColumn("s", from_json(col("payload_json"), SignalSchema))
    parsed.select(
      sessionId.cast("string").as("session_id"),
      ts.cast("timestamp").as("ts"),
      wireEventName(col("s")).as("event_name"),
      col("s")("gameId").as("game_id"),
      col("s")("tickCount").as("tick"),
      col("s")("price").as("price"),
      col("payload_json").as("raw_json"))
      .as[RawEvent]
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S10 variant — CDP (Chrome DevTools Protocol) WebSocket-interception
  * replay source (`src/sources/cdp_websocket_interceptor.py:20-236`).
  *
  * The reference's PRIMARY capture path is not its own socket client but a
  * browser: a CDP session subscribes to the Network domain and receives every
  * WebSocket frame the page sees as JSON envelopes —
  * `Network.webSocketCreated {requestId, url}` announces a socket,
  * `Network.webSocketFrameReceived/Sent {requestId, timestamp,
  * response:{payloadData}}` carry the socket.io text frames, and
  * `Network.webSocketClosed` retires the id. The browser plumbing itself is
  * out of scope here; what this module provides is the ENVELOPE grammar as
  * column expressions, so a recorded CDP session (one envelope JSON per
  * line — the natural dump of a CDP event log) replays through the exact
  * same [[SocketFrames]] → [[Normalizer]] → [[Ingest]] path as the live
  * client's spool. Works over `spark.read.text` and `spark.readStream.text`
  * alike — the transform is the same declarative plan either way.
  *
  * Two interceptor behaviors are relational rather than stateful here:
  *   - socket tracking (`_handle_websocket_created`,
  *     `cdp_websocket_interceptor.py:60-72`): the reference keeps the one
  *     matching requestId under a lock; a recording already contains all
  *     `webSocketCreated` envelopes, so the matching ids are a bounded
  *     manifest read ([[scanRecording]]) and frame selection is an `isin`
  *     filter that pushes into the scan.
  *   - monotonic→epoch mapping (`_to_epoch_seconds`,
  *     `cdp_websocket_interceptor.py:146-166`): CDP timestamps are monotonic
  *     seconds, not epoch; the reference anchors the first-seen value to the
  *     wall clock at capture time. A replay anchors the recording's first
  *     frame timestamp ([[Recording.cdpBase]]) to the capture-time wall
  *     clock the recording's writer stored alongside it (`wallBaseMs`).
  *     Values that already look like epoch seconds (≥1e9) pass through.
  */
object CdpFrames {

  /** The Network-domain envelope fields this source reads. `from_json` with
    * a fixed schema means malformed lines become NULLs, not failures —
    * a recording truncated mid-line drops that line only.
    */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("method", StringType),
    StructField("params", StructType(Seq(
      StructField("requestId", StringType),
      StructField("url", StringType),
      StructField("timestamp", DoubleType),
      StructField("response", StructType(Seq(
        StructField("opcode", IntegerType),
        StructField("payloadData", StringType)))))))))

  /** One envelope JSON line → flat columns. */
  def envelopes(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value"), EnvelopeSchema).as("e"))
      .select(
        col("e.method").as("method"),
        col("e.params.requestId").as("request_id"),
        col("e.params.url").as("url"),
        col("e.params.timestamp").as("cdp_ts"),
        col("e.params.response.payloadData").as("payload"))

  /** Target-socket predicate (`_is_rugs_websocket`,
    * `cdp_websocket_interceptor.py:56-58`): secure websocket, socket.io
    * endpoint, host of interest. The host is a parameter — the engine has
    * no business hard-coding a backend.
    */
  def isTargetUrl(url: Column, host: String): Column =
    url.startsWith("wss://") && url.contains(host) && url.contains("socket.io")

  /** Replay manifest: the matched socket ids and the monotonic base. Both
    * are bounded driver-side scalars (a recording announces a handful of
    * sockets), the same class of pre-read as a parquet footer rowCount.
    */
  final case class Recording(socketIds: Seq[String], cdpBase: Double)

  def scanRecording(spark: SparkSession, path: String, host: String): Recording = {
    val env = envelopes(spark.read.text(path)).cache()
    try {
      val ids = env
        .filter(col("method") === "Network.webSocketCreated" &&
          isTargetUrl(col("url"), host))
        .select("request_id").distinct()
        .collect().map(_.getString(0)).toSeq
      val base =
        if (ids.isEmpty) 0.0
        else env
          .filter(col("method").isin(
            "Network.webSocketFrameReceived", "Network.webSocketFrameSent") &&
            col("request_id").isin(ids: _*) && col("cdp_ts") < 1e9)
          .agg(min("cdp_ts")).head() match {
            case r if r.isNullAt(0) => 0.0
            case r => r.getDouble(0)
          }
      Recording(ids, base)
    } finally env.unpersist()
  }

  /** Frame envelopes of the matched sockets → the [[SocketFrames]] input
    * shape: `value` (the socket.io text frame), plus `request_id`,
    * `direction` (received|sent, `_process_frame`'s tag) and `epoch_sec`
    * (wall-clock seconds after monotonic mapping).
    */
  def frames(lines: DataFrame, rec: Recording, wallBaseMs: Long): DataFrame =
    envelopes(lines)
      .filter(col("method").isin(
        "Network.webSocketFrameReceived", "Network.webSocketFrameSent") &&
        col("request_id").isin(rec.socketIds: _*) &&
        col("payload").isNotNull)
      .withColumn("direction",
        when(col("method").endsWith("Received"), "received").otherwise("sent"))
      .withColumn("epoch_sec",
        when(col("cdp_ts") >= 1e9, col("cdp_ts"))
          .otherwise(lit(wallBaseMs / 1000.0) +
            (coalesce(col("cdp_ts"), lit(rec.cdpBase)) - lit(rec.cdpBase))))
      .withColumn("value", col("payload"))

  /** Recorded CDP session → [[RawEvent]]s on the live path's exact grammar:
    * received frames only (sent frames are the client's own actions, not
    * game evidence), session identity = the CDP requestId, event time = the
    * mapped wall clock. Feed the result to [[Normalizer.normalize]] /
    * [[Ingest.start]] unchanged.
    */
  def rawEvents(lines: DataFrame, rec: Recording, wallBaseMs: Long): Dataset[RawEvent] =
    SocketFrames.rawEvents(
      frames(lines, rec, wallBaseMs).filter(col("direction") === "received"),
      col("request_id"),
      timestamp_seconds(col("epoch_sec")))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** T10/T11/T12 (SURVEY §2.9): throttled replay of the recorded store and
  * state reconciliation.
  */
object Replay {

  /** T11 — replay-at-speed: the reference plays recorded ticks back through
    * the live pipeline with a speed multiplier (`src/core/replay_engine.py:
    * 24-77`, `backtest_service.py:337-395`). Spark-native form: the
    * partitioned store read AS A STREAM with `maxFilesPerTrigger` as the
    * throttle — each micro-batch replays a bounded slice of the recording,
    * and downstream consumers are the same streaming DAG the live feed uses
    * (T10's rate limiting falls out of the same knob).
    */
  def stream(spark: SparkSession, path: String, schema: StructType,
      filesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(path)

  /** T12 — state reconciliation: server-authoritative snapshots vs locally
    * derived state, compared on (game_id, tick) (`src/core/game_state.py:
    * 299-391`, `src/services/state_verifier.py`). Works on batch frames and
    * as a stream-stream join (both sides watermarked by the caller). Emits
    * one row per compared key with the mismatch flag and the drift.
    */
  def reconcile(local: DataFrame, server: DataFrame,
      tolerance: Double = 1e-9): DataFrame = {
    val l = local.select(col("game_id"), col("tick"),
      col("price").as("local_price"))
    val s = server.select(col("game_id"), col("tick"),
      col("price").as("server_price"))
    l.join(s, Seq("game_id", "tick"))
      .withColumn("drift", col("local_price") - col("server_price"))
      .withColumn("mismatch", abs(col("drift")) > tolerance)
  }
}

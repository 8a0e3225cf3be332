package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end store validation (`src/scripts/validate_eventstore_e2e.py`
  * + the contract checks of `tests/verify_contracts.py`): one report row per
  * doc_type with the integrity signals an operator checks before trusting a
  * capture — counts, time range, envelope-contract violations, JSON
  * corruption, and per-session seq continuity.
  */
object StoreValidator {

  def validate(spark: SparkSession, path: String): DataFrame = {
    val env = EventStore.read(spark, path)
    // Per (doc_type, session): duplicate seqs are always a violation.
    // Density (gap-free seq ranges) is checked per SESSION across all
    // doc_types — seq is assigned per session and doc_types interleave.
    val perSession = env
      .filter(col("session_id").isNotNull)
      .groupBy("doc_type", "session_id")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("seq")).as("n_distinct_seq"))
      .withColumn("has_dup_seq", col("n_distinct_seq") < col("n"))
    val sessionGaps = env
      .filter(col("session_id").isNotNull)
      .groupBy("session_id")
      .agg(count(lit(1)).as("n"),
        min("seq").as("min_seq"), max("seq").as("max_seq"))
      .withColumn("has_gap", col("max_seq") - col("min_seq") + 1 > col("n"))
      .agg(sum(when(col("has_gap"), 1).otherwise(0)).as("n_sessions_with_gaps"))
    env.groupBy("doc_type").agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("session_id")).as("n_sessions"),
        min("ts").as("min_ts"),
        max("ts").as("max_ts"),
        sum(when(col("ts").isNull || col("session_id").isNull ||
          col("seq").isNull, 1).otherwise(0)).as("n_contract_violations"),
        sum(when(col("raw_json").isNull ||
          !(col("raw_json").startsWith("{") || col("raw_json").startsWith("[")),
          1).otherwise(0)).as("n_bad_json"))
      .join(
        perSession.groupBy("doc_type")
          .agg(sum(when(col("has_dup_seq"), 1).otherwise(0)).as("n_sessions_dup_seq")),
        Seq("doc_type"), "left")
      .crossJoin(broadcast(sessionGaps)) // one store-wide density signal
      .withColumn("ok",
        col("n_contract_violations") === 0 && col("n_bad_json") === 0 &&
          coalesce(col("n_sessions_dup_seq"), lit(0L)) === 0)
      .orderBy("doc_type")
  }
}

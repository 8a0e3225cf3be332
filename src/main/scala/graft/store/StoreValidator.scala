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
    val perSession = env
      .filter(col("session_id").isNotNull)
      .groupBy("doc_type", "session_id")
      .agg(count(lit(1)).as("n"),
        min("seq").as("min_seq"), max("seq").as("max_seq"),
        countDistinct(col("seq")).as("n_distinct_seq"))
      // a session's seq range must be dense and duplicate-free WITHIN the
      // session (seq is assigned per session, doc_types interleave, so the
      // per-doc_type view checks duplicates only)
      .withColumn("has_dup_seq", col("n_distinct_seq") < col("n"))
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
      .withColumn("ok",
        col("n_contract_violations") === 0 && col("n_bad_json") === 0 &&
          coalesce(col("n_sessions_dup_seq"), lit(0L)) === 0)
      .orderBy("doc_type")
  }
}

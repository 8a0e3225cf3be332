package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every key has BOTH a Spark
  * implementation (`queries`) and, when SQL-expressible, a DuckDB oracle
  * (`oracleSql`) with IDENTICAL output column names (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  private[graft] val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (ops.CoreQueries.queries, ops.CoreQueries.oracles),
    (ops.WindowQueries.queries, ops.WindowQueries.oracles),
    (ops.EventQueries.queries, ops.EventQueries.oracles),
    (ops.AnalyticsQueries.queries, ops.AnalyticsQueries.oracles),
    (ops.OrderStatistics.queries, ops.OrderStatistics.oracles),
    (text.TextQueries.queries, text.TextQueries.oracles),
    (text.HeavyHitters.queries, text.HeavyHitters.oracles),
    (similarity.SimilarityQueries.queries, similarity.SimilarityQueries.oracles),
    (similarity.DedupClusters.queries, similarity.DedupClusters.oracles),
    (similarity.Embeddings.queries, similarity.Embeddings.oracles),
    (similarity.QuantizedAnn.queries, similarity.QuantizedAnn.oracles),
    (similarity.ProductQuantization.queries, similarity.ProductQuantization.oracles),
    (similarity.IvfPq.queries, similarity.IvfPq.oracles),
    (multimodal.MultimodalQueries.queries, multimodal.MultimodalQueries.oracles),
    (multimodal.Mp4Demux.queries, multimodal.Mp4Demux.oracles),
    (multimodal.WebmDemux.queries, multimodal.WebmDemux.oracles))

  /** Flagship: the reference's richest single query — `get_tick_features`
    * (`src/services/event_store/duckdb.py:408-458`) — LAG delta, pct change
    * with NULLIF guard, rolling 5/10-row STDDEV, running MAX, drawdown, one
    * shared window; keyed per-entity so the sort is partition-local at scale.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val w5 = w.rowsBetween(-4, 0)
    val w10 = w.rowsBetween(-9, 0)
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val prev = lag(col("value"), 1).over(w)
    val runMax = max(col("value")).over(wRun)
    Tables.events(spark, d).select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      (col("value") - prev).as("delta"),
      (col("value") - prev).divide(when(prev === 0, null).otherwise(prev)).as("pct_change"),
      when(count(lit(1)).over(w5) >= 2, stddev(col("value")).over(w5)).as("vol_5"),
      when(count(lit(1)).over(w10) >= 2, stddev(col("value")).over(w10)).as("vol_10"),
      runMax.as("running_max"),
      (col("value").divide(when(runMax === 0, null).otherwise(runMax)) - 1).as("drawdown"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}

package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for the library: UTC (oracle parity), AQE with
  * skew handling, right-sized shuffle partitions, and the graft native
  * functions registered via GraftExtensions.
  *
  * `shufflePartitions` should track executor-core count locally; on a real
  * cluster size it so a post-shuffle partition of the largest stage fits in
  * executor memory (AQE coalescing then trims the small stages).
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .withExtensions(new functions.GraftExtensions)

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

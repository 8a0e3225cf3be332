package graft

/** Plan-inspection aid: `runMain graft.ExplainQ <sfDir> <queryName>` prints
  * the formatted physical plan of a registered query — the `.explain`
  * pass the scaling notes call for, runnable against any replica ladder
  * directory without writing a throwaway main each time.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
    val df = fn(spark, sfDir)
    // formatted mode: operator tree + per-node details (PushedFilters,
    // ReadSchema, partial/final agg modes) — the view the scale audit reads
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(
        sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "formatted"))))
    spark.stop()
  }
}

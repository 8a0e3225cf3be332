package graft.store

import graft.{GraftSession, SparkEntry}

/** CLI: dump a registered query's result as an Arrow IPC stream file —
  * the S9 exchange driven end-to-end (`ArrowDump <sfDir> <queryName>
  * <outFile>`). Any Arrow consumer (pyarrow, duckdb, polars) reads the
  * output directly; this is the reference's `query_arrow` surface
  * (duckdb.py:104-123) as a batch artifact.
  */
object ArrowDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, outFile) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(outFile))
    val rows =
      try ArrowExchange.writeIpcStream(SparkEntry.queries(name)(spark, sfDir), out)
      finally out.close()
    println(s"""{"query":"$name","rows":$rows,"out":"$outFile"}""")
    spark.stop()
  }
}

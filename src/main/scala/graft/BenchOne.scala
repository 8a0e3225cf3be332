package graft

/** Builder-side iteration aid (not part of the library): time named queries
  * repeatedly in one warm JVM. Usage: BenchOne <sfDir> <n> <name...>
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach { t =>
      try {
        if (t == "events") Tables.events(spark, sfDir).count()
        else Tables.load(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    }
    for (rep <- 1 to n; name <- names) {
      val t0 = System.nanoTime()
      // full materialization (Bench.materialize): count() lets Catalyst
      // prune the actual work for some plans — see Bench scaladoc
      Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
      println(f"rep$rep $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}

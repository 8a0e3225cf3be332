package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query steady-state seconds.
  *
  * A warm-up pass (untimed) touches every table and runs one trivial job so
  * the timed numbers measure query execution, not first-job JVM costs
  * (executor thread init, parquet footer reads) — otherwise whatever query
  * happens to run first absorbs ~6 s of fixed overhead and the per-query
  * attribution is meaningless. Each query then runs once untimed before its
  * timed run: the first execution of a plan pays one-time driver costs that
  * are per-QUERY-SHAPE, not per-execution — Janino whole-stage-codegen
  * compilation (~0.1–0.3 s per distinct plan) and JIT warm-up of the
  * generated classes — which a long-lived session amortizes to zero. The
  * timed number is the steady-state execution cost, the quantity that
  * actually scales with data volume.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

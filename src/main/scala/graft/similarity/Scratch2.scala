package graft.similarity

/** Builder-side throwaway probe (never committed). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.embeddings(spark, d).count()
    def time(name: String)(f: => Unit): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"$name rep$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    time("fit_only") {
      val (a, b, c) = IvfPq.fit(spark, d)
      graft.Bench.materialize(a); graft.Bench.materialize(b); graft.Bench.materialize(c)
    }
    time("q38_full") {
      graft.Bench.materialize(IvfPq.q38IvfPqAnn(spark, d))
    }
    spark.stop()
  }
}

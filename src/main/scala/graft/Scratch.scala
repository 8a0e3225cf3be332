package graft

/** Builder-side throwaway probe (never committed): time sub-stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach { t =>
      try {
        if (t == "events") Tables.events(spark, d).count()
        else Tables.load(spark, d, t).count()
      } catch { case _: Throwable => () }
    }
    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"$name rep$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }
    // q81 stage 1: fingerprints only
    time("q81_fp_only") {
      Bench.materialize(graft.text.TextQueries.winnowFingerprints(spark, d))
    }
    // q81 full
    time("q81_full") {
      Bench.materialize(graft.text.TextQueries.q81WinnowOverlap(spark, d))
    }
    // q48 stage: shingles+hash only (no winnow windows)
    import org.apache.spark.sql.functions._
    time("q48_hash_only") {
      graft.functions.Hash64.register(spark)
      val df = Tables.documents(spark, d)
        .withColumn("__sh", expr("text_shingles(text, 3)"))
        .filter(size(col("__sh")) >= 4)
        .withColumn("hs", expr("transform(__sh, x -> hash64(x))"))
        .select(col("doc_id"), size(col("hs")).as("n"),
          array_min(col("hs")).as("mn"))
      Bench.materialize(df)
    }
    time("q48_full") {
      Bench.materialize(graft.similarity.SimilarityQueries.q48Winnowing(spark, d))
    }
    spark.stop()
  }
}

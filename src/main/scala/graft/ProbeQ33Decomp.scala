package graft

import org.apache.spark.sql.functions._

/** Builder-side decomposition of q33's residual engine gap (r15 verdict
  * #7: 1.61× DuckDB at 10× — the worst idiomatic data-bound ratio left
  * after the native text_stats pass took q32 to 0.83×). Times four
  * variants at one rung so the wall splits into (scan+text_stats) +
  * (ratio arithmetic) + (global sort tail) + (output width):
  *
  *   full        — the registered q33 (stats + ratios + ORDER BY doc_id)
  *   no_sort     — same minus the ORDER BY (what a pipeline consumer
  *                 that re-partitions anyway would run)
  *   stats_only  — text_stats scan + one projected count, no ratios,
  *                 no sort (the irreducible decode floor)
  *   q32_full    — the sibling query (0.83× DuckDB) for reference: same
  *                 scan, same sort, integer outputs
  *
  * Usage: ProbeQ33Decomp <sfDir> (reps via SPARK_GRAFT_PROBE_REPS,
  * default 3). Emits one JSON line, min-of-reps.
  */
object ProbeQ33Decomp {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def r3(x: Double) = math.round(x * 1000.0) / 1000.0
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val q33 = SparkEntry.queries("q33_text_quality")
    val q32 = SparkEntry.queries("q32_token_count")
    def noSort() = {
      // q33 minus the total-order tail, same expressions
      val st = graft.functions.TextStats.text_stats(spark, "text",
        text.TextQueries.stopwords)
      val nTok = col("st.n_tokens")
      val nChars = col("st.n_chars")
      Tables.documents(spark, d)
        .select(col("doc_id"), st.as("st"))
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          (col("st.n_stopword_tokens").cast("double") / nTok.cast("double"))
            .as("stopword_ratio"),
          (col("st.n_unique_tokens").cast("double") / nTok.cast("double"))
            .as("type_token_ratio"),
          ((nChars - nTok + 1).cast("double") / nTok.cast("double"))
            .as("mean_token_len"),
          when(nChars > 0,
            col("st.n_punct_chars").cast("double") / nChars.cast("double"))
            .as("punct_ratio"))
    }
    def statsOnly() =
      Tables.documents(spark, d)
        .select(col("doc_id"),
          graft.functions.TextStats.text_stats(spark, "text",
            text.TextQueries.stopwords).getField("n_tokens").as("n_tokens"))

    def q37NoSort() = {
      val st = graft.functions.TextStats.text_stats(spark, "text",
        Seq("the", "a", "of"))
      Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), st.as("st"))
        .select(col("doc_id"), col("lang"),
          col("st.n_stopword_tokens").as("en_stopword_hits"),
          (col("st.n_stopword_tokens").cast("double")
            / col("st.n_tokens").cast("double")).as("en_score"))
    }
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "full" -> (() => q33(spark, d)),
      "no_sort" -> (() => noSort()),
      "stats_only" -> (() => statsOnly()),
      // the floor below any text query: scan the projected columns and
      // materialize the same output width, no text_stats at all
      "scan_floor" -> (() => Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))),
      // range partitioning's sampling pass re-executes the child plan, so
      // ORDER BY over computed stats runs text_stats twice; a checkpoint
      // barrier materializes the small stats rows once and sorts those
      "ckpt_then_sort" -> (() => noSort().localCheckpoint().orderBy("doc_id")),
      "q32_full" -> (() => q32(spark, d)),
      // q37's decomposition (r16 verdict: 7.3× DuckDB at 10× — is it
      // compute or pipeline floor?): full = registered (ckpt+sort);
      // no_sort drops the total-order tail
      "q37_full" -> (() => SparkEntry.queries("q37_lang_id")(spark, d)),
      "q37_no_sort" -> (() => q37NoSort()))

    val cells = variants.map { case (name, mk) =>
      Bench.materialize(mk()) // warm
      val walls = (1 to reps).map(_ => time(Bench.materialize(mk())))
      s""""$name":{"wall_min":${r3(walls.min)},"reps":[${walls.map(r3).mkString(",")}]}"""
    }
    println(s"""{"probe":"q33_decomp","sf":"$d","reps":$reps,""" +
      s""""statistic":"min_of_reps","cells":{${cells.mkString(",")}}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Builder-side decomposition of the q79/q80/q82/q86 constant-factor
  * family (r16 verdict #1/#2: 2.2–6.2× the DuckDB proxy for rounds).
  * Times each pipeline's stages at one rung so the wall splits into
  * (gram explode + hash) + (count shuffle + checkpoint) + (model build +
  * scoring join + per-doc agg) + (total-order tail):
  *
  *   q79_full        — the registered q79 (fused counts, checkpoint-then-sort)
  *   q79_scores      — q79ScoresDf (no sort tail)
  *   q79_sort_nockpt — ORDER BY directly over the scoring pipeline
  *                     (range-partition sampling re-executes it — the
  *                     r16 registered shape's tail defect)
  *   q79_counts      — the fused scan stage alone (dsir_bucket_counts)
  *   q79_tcnt_r16    — the REPLACED relational shape: gram explode +
  *                     bucket + (doc,bucket) count shuffle
  *   q79_grams_r16   — gram explode + bucket only (the old scan floor)
  *   q80_full / q80_scores / q80_counts / q80_tcnt_r16 / q80_trans_r16 —
  *                     same cuts for the LM
  *   q82_full        — TakeOrdered over q79's unsorted core
  *   q86_full / q58_full — the decontamination pair (q86 = q58 + bloom)
  *
  * Usage: ProbeDsirDecomp <sfDir> (reps via SPARK_GRAFT_PROBE_REPS,
  * default 3). Emits one JSON line, min-of-reps.
  */
object ProbeDsirDecomp {
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

    def toks = split(col("text"), " ")
    val b = text.TextQueries.DsirBuckets
    def bucketOf(c: org.apache.spark.sql.Column) =
      pmod(functions.Md5Prefix32.md5_prefix32(c), lit(b.toLong))
    def q79Grams() = {
      val bi = functions.TextShingles.text_shingles(spark, "text", 2)
      Tables.documents(spark, d)
        .select(col("doc_id"), col("source"),
          explode(concat(toks, bi)).as("gram"))
        .select(col("doc_id"), col("source"), bucketOf(col("gram")).as("bucket"))
    }
    def q79Tcnt() = q79Grams()
      .groupBy("doc_id", "source", "bucket").agg(count(lit(1)).as("cnt"))

    def q80Trans() = {
      import graft.functions.Hash64.{hash64 => h64}
      Tables.documents(spark, d).select(col("doc_id"), col("source"),
        explode(functions.TextShingles.text_shingles(spark, "text", 2)).as("bg"))
        .select(col("doc_id"), col("source"),
          h64(substring_index(col("bg"), " ", 1)).as("hp"),
          h64(col("bg")).as("hb"))
    }
    def q80Tcnt() = q80Trans()
      .groupBy("doc_id", "source", "hp", "hb").agg(count(lit(1)).as("cnt"))

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q79_full" -> (() => SparkEntry.queries("q79_dsir_weights")(spark, d)),
      "q79_scores" -> (() => text.TextQueries.q79ScoresDf(spark, d)),
      "q79_sort_nockpt" -> (() => text.TextQueries.q79ScoresDf(spark, d)
        .orderBy("doc_id")),
      "q79_counts" -> (() => Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), functions.DsirBucketCounts
          .dsir_bucket_counts(spark, "text", b).as("bc"))),
      "q79_tcnt_r16" -> (() => q79Tcnt()),
      "q79_grams_r16" -> (() => q79Grams()),
      "q80_full" -> (() => SparkEntry.queries("q80_lm_perplexity")(spark, d)),
      "q80_scores" -> (() => text.TextQueries.q80Scores(spark, d)),
      "q80_counts" -> (() => Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), functions.BigramHashCounts
          .bigram_hash_counts(spark, "text").as("bgc"))),
      "q80_tcnt_r16" -> (() => q80Tcnt()),
      "q80_trans_r16" -> (() => q80Trans()),
      // q80 scoring-region decomposition (all on a fresh fused pipeline):
      "q80_ckpt" -> (() => Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), functions.BigramHashCounts
          .bigram_hash_counts(spark, "text").as("bgc"))
        .localCheckpoint()),
      "q80_explode" -> (() => Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), functions.BigramHashCounts
          .bigram_hash_counts(spark, "text").as("bgc"))
        .select(col("doc_id"), col("source"), explode(col("bgc")).as("e"))
        .select(col("doc_id"), col("source"), col("e.hp").as("hp"),
          col("e.hb").as("hb"), col("e.cnt").as("cnt"))),
      "q80_model" -> (() => {
        val docs = Tables.documents(spark, d)
        val counts = docs.select(col("doc_id"), col("source"),
          functions.BigramHashCounts.bigram_hash_counts(spark, "text").as("bgc"))
          .localCheckpoint()
        val tgtDf = docs.agg(min(col("source")).as("tgt"))
        val tTrans = counts.crossJoin(broadcast(tgtDf))
          .filter(col("source") === col("tgt"))
          .select(explode(col("bgc")).as("e"))
          .select(col("e.hp").as("hp"), col("e.hb").as("hb"),
            col("e.cnt").as("cnt"))
        tTrans.groupBy("hb").agg(sum("cnt").as("c"))
          .select(col("hb").as("key"), col("c"))
          .unionByName(tTrans.groupBy("hp").agg(sum("cnt").as("c"))
            .select(col("hp").as("key"), col("c")))
      }),
      "q82_full" -> (() => SparkEntry.queries("q82_dsir_sample")(spark, d)),
      "q86_full" -> (() => SparkEntry.queries("q86_bloom_decontamination")(spark, d)),
      "q58_full" -> (() => SparkEntry.queries("q58_decontamination")(spark, d)))

    val cells = variants.map { case (name, mk) =>
      Bench.materialize(mk()) // warm
      val walls = (1 to reps).map { _ =>
        System.gc()
        time(Bench.materialize(mk()))
      }
      s""""$name":{"wall_min":${r3(walls.min)},"reps":[${walls.map(r3).mkString(",")}]}"""
    }
    println(s"""{"probe":"dsir_decomp","sf":"$d","reps":$reps,""" +
      s""""statistic":"min_of_reps","cells":{${cells.mkString(",")}}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Builder-side probe for q77's 100× CPU exponent (r14 verdict #8): the
  * compound-banding comment predicts incidental candidate collisions of
  * ~bands·N²/2^(b+1) ≈ N²/2^22.7 under uniform occupancy — a QUADRATIC
  * term that is negligible at 10× (N = 50k → ~0.4M pairs) but material at
  * 100× (N = 500k → ~37M), so a super-linear CPU octave is the arithmetic
  * showing up on schedule, not a plan defect. This measures the actual
  * candidate volume Σ C(bucket, 2) per band table at each scale (plus the
  * true-pair output count) so the exponent's explanation is a measured
  * number, not a formula. Usage: ProbeQ77Cands <dir1x> <dir10x> <dir100x>
  */
object ProbeQ77Cands {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import similarity.SimilarityQueries.{SimBlockOffsets, SimBlockPairs, SimBlockWidths}

    val legs = args.toSeq.zip(Seq("1x", "10x", "100x")).map { case (d, label) =>
      val sigs = Tables.documents(spark, d)
        .withColumn("__toks", split(col("text"), " "))
        .select(col("doc_id"),
          graft.functions.SimHash64.simhash64(spark, "__toks").as("simhash"))
      def block(i: Int) =
        shiftrightunsigned(col("simhash"), SimBlockOffsets(i))
          .bitwiseAND(lit((1L << SimBlockWidths(i)) - 1))
      val banded = sigs.select(col("doc_id").as("id"),
        posexplode(array(SimBlockPairs.map { case (i, j) =>
          shiftleft(block(i), SimBlockWidths(j)).bitwiseOR(block(j))
        }: _*)).as(Seq("band", "bkey")))
      val row = banded.groupBy("band", "bkey").agg(count(lit(1)).as("k"))
        // sum the even product in int64, halve once at the end (a per-row
        // /2 is Spark double division -> the collect's getLong CCE'd);
        // the double cast is exact far below 2^53 at these volumes
        .agg((sum(col("k") * (col("k") - 1)) / 2).cast("long").as("cand"),
          max("k").as("max_bucket"), count(lit(1)).as("n_buckets"))
        .collect()(0)
      val n = Tables.rowCount(spark, d, "documents")
      s"""{"sf":"$label","n_docs":$n,"candidate_pairs":${row.getLong(0)},""" +
        s""""max_bucket":${row.getLong(1)},"n_buckets":${row.getLong(2)}}"""
    }
    println(s"""{"probe":"q77_candidate_volume",""" +
      s""""note":"candidates = sum over band buckets of C(k,2); the uniform-occupancy prediction is bands*N^2/2^(b+1) ~ N^2/2^22.7 — quadratic, negligible at 10x, material at 100x",""" +
      s""""legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for the library: UTC (oracle parity), AQE with
  * skew handling, right-sized shuffle partitions, and the graft native
  * functions registered via GraftExtensions.
  *
  * `shufflePartitions` should track executor-core count locally; on a real
  * cluster size it so a post-shuffle partition of the largest stage fits in
  * executor memory (AQE coalescing then trims the small stages).
  *
  * Measured and DISCARDED (round 11): raising
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` to
  * 16× cores so big stages keep finer grain while AQE coalesces small
  * ones. Motivation was q52's per-row CPU climbing 1.5→2.2 µs across the
  * 30×→100× octave (100× the rows into the same 32 window sorts); the
  * serialized A/B at 100× showed the win is confined to that shape
  * (q52 wall 1.61→1.41 s) while every chained-shuffle plan pays the
  * 512-way map-side fan-out repeatedly — q63 task CPU 296→720 s, q04
  * 87→195 s. On a real cluster the knob to move is `shufflePartitions`
  * itself, sized so the largest stage's post-shuffle partition fits in
  * executor memory — which this builder already parameterizes.
  */
object GraftSession {

  /** Scan-split sizing is a PER-DEPLOYMENT knob, not a constant: a real
    * cluster reading 100 TB wants the Spark defaults (128 MB
    * maxPartitionBytes / 4 MB openCost) or larger, while local[32] over
    * MB-scale test tables wants small splits — the defaults put a whole
    * ~10 MB single-file table into ONE scan task, so every scan-stage
    * computation (decimal sums, percentile state, shingling) runs
    * single-threaded while a vectorized in-process engine parallelizes
    * row groups across all cores (measured r13: q01's decimal aggregate
    * 1.34 s on one core vs ~0.2 s split). Defaults here are the
    * local-bench values; override per call or via
    * SPARK_GRAFT_MAX_PARTITION_BYTES / SPARK_GRAFT_OPEN_COST_BYTES
    * (a cluster deployment sets 128-256 MB / 4 MB). AQE coalescing
    * absorbs extra splits on the shuffle side either way.
    */
  val LocalBenchMaxPartitionBytes: Long = 4L * 1024 * 1024
  val LocalBenchOpenCostInBytes: Long = 512L * 1024

  private def envBytes(name: String, dflt: Long): Long =
    sys.env.get(name).map(_.trim.toLong).getOrElse(dflt)

  def builder(master: String = "local[*]", shufflePartitions: Int = 32,
      maxPartitionBytes: Long = envBytes(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", LocalBenchMaxPartitionBytes),
      openCostInBytes: Long = envBytes(
        "SPARK_GRAFT_OPEN_COST_BYTES", LocalBenchOpenCostInBytes))
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Measured and DISCARDED (r17): coalescePartitions.parallelismFirst
      // = false (respect the advisory size; the setting Spark's docs
      // recommend and guide 2.2's fewer-larger-partitions direction).
      // Net +1.3 s on the 15 heaviest queries at sf0.1/32 (q50 0.61 ->
      // 1.21, q55 0.79 -> 1.21, q43 0.67 -> 1.07 regressed; q74/q73/q05
      // improved ~0.1 each): with MB-scale shuffles everything coalesces
      // to ONE partition, serializing window/join stages that the
      // parallelism floor kept spread. On a cluster whose shuffles
      // exceed the 64 MB advisory size the flag is moot by construction.
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.files.openCostInBytes", openCostInBytes)
      // Bucket-sorted scans report their sort order (off by default since
      // Spark 3.1 because MULTI-file buckets would interleave); Spark still
      // guards with the one-file-per-bucket check, and Partitioning
      // .writeBucketed repartitions on the bucket key so that check holds.
      // This is what lets the bucketed event-store layout run window and
      // episode queries with no Sort at all (BucketedLayoutSpec).
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .withExtensions(new functions.GraftExtensions)

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

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

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Split small parquet inputs across the cores: the defaults
      // (128 MB maxPartitionBytes, 4 MB openCost) put a whole ~10 MB
      // single-file table into ONE scan task, so every scan-stage
      // computation — decimal sums, exact percentile state, shingling —
      // runs single-threaded while a vectorized in-process engine
      // parallelizes row groups across all cores (measured r13: q01's
      // decimal aggregate 1.34 s on one core vs ~0.2 s split; the
      // systematic sf0.1 engine-cmp deficit). 4 MB is the local[32]
      // right-size for MB-scale files; a real cluster reading 100 TB
      // RAISES maxPartitionBytes back toward 128-256 MB — this is the
      // per-deployment knob, sized here for the gated SFs, and AQE
      // coalescing absorbs the extra splits on the shuffle side either
      // way.
      .config("spark.sql.files.maxPartitionBytes", 4 * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512 * 1024)
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

package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's rebuildable vector index as a Spark-native batch pipeline
  * (`src/services/vector_indexer/indexer.py:94-208` + `chunker.py`):
  * incremental chunk consumption (ts > checkpoint) → embedding → an
  * LSH-cell-partitioned index table → cell-local cosine search.
  *
  * The EMBEDDING step is a deterministic stub (feature hashing of tokens —
  * no embedding model ships in this environment): real pipelines swap
  * `embed` for a model-serving stage (mapInPandas/ONNX); every other stage —
  * chunking, cell assignment, partitioned layout, search plan — is the real
  * 100 TB shape:
  *   - the index is WRITTEN partitioned by LSH cell, so a query reads ONE
  *     cell's files (partition pruning does the fan-out reduction);
  *   - cell assignment is the native one-pass `rh_signature` expression
  *     inside the scan — rebuilds are scan-speed;
  *   - search broadcasts nothing but the query vector literal.
  */
object VectorIndex {

  val Dim = 64
  val CellBits = 8 // 256 cells

  /** Deterministic stub embedding: hash each token into one of `Dim` signed
    * buckets, L2-normalize. Pure column expressions (aggregate over the
    * token array), so it runs inside codegen like the real model stage
    * would run inside its batch UDF.
    */
  def embed(chunks: DataFrame, textCol: String = "chunk_text"): DataFrame = {
    val toks = col("__toks")
    val zero = array_repeat(lit(0.0), Dim)
    val accum = aggregate(toks, zero, (acc, t) => {
      val h = xxhash64(t)
      val bucket = pmod(h, lit(Dim)).cast("int")
      val sign = when(pmod(shiftright(h, 8), lit(2)) === 0, 1.0).otherwise(-1.0)
      transform(acc, (v, i) => when(i === bucket, v + sign).otherwise(v))
    })
    chunks
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .withColumn("__raw", accum)
      .withColumn("__norm",
        sqrt(aggregate(col("__raw"), lit(0.0), (a, v) => a + v * v)))
      .withColumn("embedding",
        when(col("__norm") > 0, transform(col("__raw"), v => v / col("__norm")))
          .otherwise(col("__raw")))
      .drop("__toks", "__raw", "__norm")
  }

  /** Build (or incrementally extend) the index: chunk the store past the
    * checkpoint, embed, assign an LSH cell, append partitioned by cell.
    * Returns the new checkpoint (max ts consumed), like `indexer.py:94-116`.
    */
  def build(spark: SparkSession, storePath: String, indexPath: String,
      sinceTs: String, chunkSize: Int = 8): String = {
    // Materialize the increment ONCE: the checkpoint must be the max ts of
    // the batch that was actually WRITTEN — re-reading the live store after
    // the write would advance the checkpoint past events a concurrent
    // ingest appended in between (silently never indexed), and would run
    // the embed pipeline a second time.
    val embedded = embed(graft.store.Indexer.incrementalChunks(
        spark, storePath, sinceTs, chunkSize))
      .withColumn("cell",
        graft.functions.RandomHyperplaneSignature
          .rh_signature(spark, "embedding", CellBits))
      .persist()
    try {
      if (embedded.isEmpty) sinceTs
      else {
        embedded.write.mode("append").partitionBy("cell").parquet(indexPath)
        embedded.agg(max("max_ts")).head().getString(0)
      }
    } finally embedded.unpersist()
  }

  /** Cell-local cosine top-k: embed the query text the same way, read ONLY
    * its cell partition (plus optional Hamming-1 neighbor cells for recall),
    * rank by exact cosine.
    */
  def search(spark: SparkSession, indexPath: String, queryText: String,
      k: Int = 5, probeNeighborCells: Boolean = true): DataFrame = {
    import spark.implicits._
    val qRow = embed(Seq(queryText).toDF("chunk_text"))
      .withColumn("cell",
        graft.functions.RandomHyperplaneSignature
          .rh_signature(spark, "embedding", CellBits))
      .select("embedding", "cell").head()
    val qVec = qRow.getSeq[Double](0)
    val qCell = qRow.getLong(1)
    val cells: Seq[Long] =
      if (!probeNeighborCells) Seq(qCell)
      else qCell +: (0 until CellBits).map(b => qCell ^ (1L << b))
    spark.read.parquet(indexPath)
      .filter(col("cell").isin(cells: _*)) // partition-pruned cell read
      .withColumn("qvec", typedLit(qVec))
      .withColumn("cosine", round(
        graft.functions.CosineSimilarity.cosine_similarity(spark, "qvec", "embedding"), 6))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("cosine"), asc("session_id"), asc("chunk_id"))))
      .filter(col("rank") <= k)
      .select("rank", "session_id", "chunk_id", "cosine", "chunk_text")
      .orderBy("rank")
  }
}

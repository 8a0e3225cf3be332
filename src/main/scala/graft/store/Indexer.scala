package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** D10/D11 (SURVEY §2.10): the vector-indexer's chunk/validate ETL stages.
  *
  * The reference incrementally consumes `WHERE ts > checkpoint` from the
  * event store, chunks events into text windows for embedding, and tracks
  * the max ts as the next checkpoint (`src/services/vector_indexer/
  * indexer.py:94-158`, `chunker.py`). Validation mirrors the pydantic
  * schema-registry gate (`src/services/schema_validator/validator.py:
  * 100-179`) as `from_json` + corrupt-record severity.
  */
object Indexer {

  /** D10 — event→text chunker: consecutive events per session are grouped
    * into fixed-size chunks (chunk id = seq div chunkSize — deterministic,
    * no state), each chunk concatenating its events' text in seq order.
    * The downstream embedding UDF consumes one row per chunk.
    */
  def chunk(envelopes: DataFrame, chunkSize: Int = 8): DataFrame =
    envelopes
      .withColumn("chunk_id", (col("seq") / chunkSize).cast("long"))
      .groupBy("session_id", "chunk_id")
      .agg(
        min("seq").as("first_seq"),
        max("seq").as("last_seq"),
        count(lit(1)).as("n_events"),
        max("ts").as("max_ts"),
        // deterministic order inside the chunk: sort the collected structs
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("seq"), col("raw_json")))),
            e => e("raw_json"))).as("chunk_text"))

  /** D10 — incremental build window (P4): only events newer than the last
    * checkpoint; returns the chunked increment plus the next checkpoint
    * value (max ts seen), exactly `indexer.py:145-158`.
    */
  def incrementalChunks(spark: SparkSession, storePath: String,
      sinceTs: String, chunkSize: Int = 8): DataFrame =
    chunk(EventStore.read(spark, storePath).filter(col("ts") > lit(sinceTs)),
      chunkSize)

  /** D11 — schema validation gate: parse `raw_json` against a schema with
    * PERMISSIVE corrupt-record capture; severity mirrors the reference's
    * error/warning split (unparseable = error, parseable-but-missing-required
    * = warning).
    */
  def validate(df: DataFrame, schema: StructType, requiredField: String): DataFrame = {
    // PERMISSIVE from_json yields an all-null struct for corrupt input, so
    // corruption must be captured explicitly via columnNameOfCorruptRecord
    val ext = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    df.withColumn("parsed", from_json(col("raw_json"), ext,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("severity",
        when(col("parsed").isNull ||
          col("parsed").getField("_corrupt_record").isNotNull, "error")
          .when(col("parsed").getField(requiredField).isNull, "warning")
          .otherwise("ok"))
  }
}

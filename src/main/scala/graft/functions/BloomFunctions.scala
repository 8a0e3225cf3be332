package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** SQL surface over Catalyst's native bloom-filter pair — the same
  * expressions Spark's runtime row-level filtering injects
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed as callable
  * functions so a query can build a fixed-size set summary of a SMALL
  * side distributed (partial sketches merged map-side, one binary out)
  * and prefilter a LARGE side scan-side before any exact join:
  *
  * {{{
  *   bloom_agg(xxhash64(key), estimatedItems, numBits) -> binary
  *   bloom_contains(filterBinary, xxhash64(key))       -> boolean
  * }}}
  *
  * Both operate on XXH64 hashes of the key (the aggregate inserts longs,
  * the probe tests longs) — pass `xxhash64(col)` on both sides, exactly
  * as the optimizer's injected filters do. `bloom_contains` requires the
  * filter argument to be FOLDABLE (a literal): build the filter first,
  * collect the one fixed-size binary (bounded by numBits/8, independent
  * of data volume), and embed it with `lit(bytes)`.
  *
  * This is intentionally NOT a reimplementation: the sketch layout,
  * hashing, and eval come from `org.apache.spark.util.sketch.BloomFilter`
  * via the shipped expressions; graft only registers names for them.
  */
object BloomFunctions {

  /** Arity-dispatching builders — the ONE definition shared by [[register]]
    * (temp-function path) and GraftExtensions.injectFunction (session
    * extension path), so the two registration routes cannot drift.
    */
  val aggBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(child) => new BloomFilterAggregate(child)
    case Seq(child, items) => new BloomFilterAggregate(child, items)
    case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
    case other => throw new IllegalArgumentException(
      s"bloom_agg(xxhash64(key) [, estItems [, numBits]]), got ${other.size} args")
  }
  val containsBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(filter, value) => BloomFilterMightContain(filter, value)
    case other => throw new IllegalArgumentException(
      s"bloom_contains(filter, xxhash64(key)), got ${other.size} args")
  }

  /** Idempotent (see MinHashSignature.register). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_agg")))
      reg.createOrReplaceTempFunction("bloom_agg", aggBuilder, "built-in")
    if (!reg.functionExists(FunctionIdentifier("bloom_contains")))
      reg.createOrReplaceTempFunction("bloom_contains", containsBuilder, "built-in")
  }

  /** Aggregate a column of XXH64 longs into one serialized bloom filter. */
  def bloomAgg(spark: SparkSession, hashed: Column, estItems: Long,
      numBits: Long): Column = {
    register(spark)
    call_function("bloom_agg", hashed,
      org.apache.spark.sql.functions.lit(estItems),
      org.apache.spark.sql.functions.lit(numBits))
  }

  /** Probe a (foldable) serialized filter with a column of XXH64 longs. */
  def bloomContains(spark: SparkSession, filter: Column, hashed: Column): Column = {
    register(spark)
    call_function("bloom_contains", filter, hashed)
  }
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native functions at session build
  * time (`spark.sql.extensions=graft.functions.GraftExtensions`), so SQL
  * users get them without calling the Scala registration helpers:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT minhash_signature(shingles, 16) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      MinHashSignature.build))
    ext.injectFunction((
      FunctionIdentifier("minhash_text"),
      new ExpressionInfo(classOf[MinHashFromText].getName, "minhash_text"),
      MinHashFromText.build))
    ext.injectFunction((
      FunctionIdentifier("text_shingles"),
      new ExpressionInfo(classOf[TextShingles].getName, "text_shingles"),
      TextShingles.build))
    ext.injectFunction((
      FunctionIdentifier("text_shingle_hashes"),
      new ExpressionInfo(classOf[TextShingleHashes].getName, "text_shingle_hashes"),
      TextShingleHashes.build))
    ext.injectFunction((
      FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      TextStats.build))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      exprs => Md5Prefix32(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dsir_bucket_counts"),
      new ExpressionInfo(classOf[DsirBucketCounts].getName, "dsir_bucket_counts"),
      DsirBucketCounts.build))
    ext.injectFunction((
      FunctionIdentifier("bigram_hash_counts"),
      new ExpressionInfo(classOf[BigramHashCounts].getName, "bigram_hash_counts"),
      exprs => BigramHashCounts(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("sliding_min"),
      new ExpressionInfo(classOf[SlidingMin].getName, "sliding_min"),
      SlidingMin.build))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("rh_signature"),
      new ExpressionInfo(classOf[RandomHyperplaneSignature].getName, "rh_signature"),
      exprs => exprs match {
        case Seq(arr) => RandomHyperplaneSignature(arr, 16)
        case Seq(arr, k) =>
          RandomHyperplaneSignature(arr, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("rh_signature(arr [, k])")
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_sq"),
      exprs => L2Distance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("argmin_l2"),
      new ExpressionInfo(classOf[ArgminL2].getName, "argmin_l2"),
      ArgminL2.build))
    ext.injectFunction((
      FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
      Int8Quantize.build))
    // bloom pair: builders shared with BloomFunctions.register so the two
    // registration paths cannot drift (r12 ADVICE)
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      BloomFunctions.aggBuilder))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      BloomFunctions.containsBuilder))
    ext.injectFunction((
      FunctionIdentifier("hash64"),
      new ExpressionInfo(classOf[Hash64].getName, "hash64"),
      exprs => Hash64(exprs.head)))
    // optimizer: consolidate repeated same-column get_json_object calls
    // into one json_tuple parse (SURVEY §4's optional rule)
    ext.injectOptimizerRule(_ => graft.plans.ConsolidateJsonGets)
    // optimizer: Catalyst's size estimate for Generate keeps the child's
    // sizeInBytes, so exploded relations under-count by the expansion
    // factor and get statically broadcast — the bug class behind the q51
    // 30× OOM. The guard pins NO_BROADCAST_HASH on Generate-derived join
    // sides (explicit hints and Limits opt out).
    ext.injectOptimizerRule(_ => graft.plans.GenerateStatsGuard)
  }
}

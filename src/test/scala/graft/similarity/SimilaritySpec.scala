package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("minhash: identical docs get identical signatures; disjoint docs don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear here nothing shared at all"))
      .toDF("doc_id", "text")
    val sig = SimilarityQueries.minhashSignatures(docs)
      .select("doc_id", "minhash").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
    assert(sig(1L).length === 16)
  }

  test("minhash agreement approximates jaccard for near-duplicates") {
    // ~90% shingle overlap: one word changed at the end
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " CHANGED"
    val docs = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val sig = SimilarityQueries.minhashSignatures(docs)
      .select("doc_id", "minhash").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sig(1L).zip(sig(2L)).count { case (a, b) => a == b } / 16.0
    assert(agree > 0.5) // true jaccard ≈ 35/41 ≈ 0.85; 16 hashes is coarse
  }

  test("simhash of identical docs is identical; hamming small for near-dups") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 48).map(i => s"tok$i").mkString(" ") + " changedA changedB"
    val docs = Seq((1L, base), (2L, base), (3L, nearDup),
      (4L, (1 to 50).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sig = SimilarityQueries.q44Simhash(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sig(1L) === sig(2L))                 // identical docs, identical sig
    assert(hamming(sig(1L), sig(3L)) <= 12)     // 96% token overlap => close
    assert(hamming(sig(1L), sig(4L)) > 12)      // disjoint vocab => far
  }

  test("cosine top-k: nearest neighbor of a vector is its duplicate") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val topk = SimilarityQueries.q40CosineTopK(spark, dir)
      .filter($"qid" === 0 && $"rank" === 1).head()
    assert(topk.getAs[Long]("nid") === 1L)
    assert(math.abs(topk.getAs[Double]("cosine") - 1.0) < 1e-9)
  }
}

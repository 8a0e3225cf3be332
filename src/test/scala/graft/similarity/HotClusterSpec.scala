package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `semPairs` — q74's within-cluster pair generator — on the skew no
  * K schedule can fix: one cluster holding half the corpus (a pile of
  * near-identical embeddings lands in ONE cell at any K). The round-9
  * verdict's #3 asked for exactly this fixture: the hot cluster must
  * yield its complete c(m,2) pair set with the work chunk-salted across
  * tasks, not enumerated serially inside the one task owning the cid.
  */
class HotClusterSpec extends SparkSpec {

  import spark.implicits._

  // (cid, vec_id, v): cluster 0 holds `hot` members (50%+), the rest
  // spread 1 member per cluster — so only cluster 0 goes multi-chunk.
  private def assigned(hot: Int, rest: Int) = {
    val rows =
      (0 until hot).map(i => (0, i.toLong, Seq(i.toDouble, 1.0))) ++
      (0 until rest).map(i => (i + 1, (hot + i).toLong, Seq(i.toDouble, 2.0)))
    rows.toDF("cid", "vec_id", "v")
  }

  private def bruteForce(hot: Int, rest: Int): Set[(Long, Long)] =
    (for {
      a <- 0 until hot; b <- (a + 1) until hot
    } yield (a.toLong, b.toLong)).toSet // singleton clusters emit nothing

  test("hot cluster emits exactly the brute-force pair set, ids ordered") {
    // 120 of 200 vectors in cluster 0; chunkSize=16 → 8 chunks, so nearly
    // every pair takes the triangle-grid path (off-diagonal buckets where
    // the a/b roles come from chunks, not ids — the orientation the
    // direct-join path never exercises).
    val got = SimilarityQueries.semPairs(assigned(120, 80), chunkSize = 16)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pair emitted")
    assert(got.forall { case (a, b) => a < b }, "ordering invariant broken")
    assert(got.toSet === bruteForce(120, 80)) // 7,140 pairs, none lost
  }

  test("pair vectors travel with the right ids after re-normalization") {
    // the off-diagonal re-normalization swaps (id, vector) together; a
    // swap bug would pair id_a with vb — caught by recomputing each
    // member's vector from its id (v = [id, 1.0] in the fixture)
    val bad = SimilarityQueries.semPairs(assigned(40, 0), chunkSize = 8)
      .filter(element_at(col("va"), 1) =!= col("id_a").cast("double") ||
        element_at(col("vb"), 1) =!= col("id_b").cast("double"))
      .count()
    assert(bad === 0)
  }

  test("hot-cluster expansion spreads across tasks with bounded per-task share") {
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      val pairs = SimilarityQueries.semPairs(assigned(200, 0), chunkSize = 16)
        .select(spark_partition_id().as("pid"))
        .groupBy("pid").count().as[(Int, Long)].collect()
      val total = pairs.map(_._2).sum
      assert(total === 200L * 199 / 2)
      assert(pairs.length > 1,
        s"one cluster's ${total} pairs were emitted by a single task")
      // 13 chunks → 91 buckets over 4 shuffle partitions: no task should
      // own more than ~half the pairs (generous bound; serial would be 1.0)
      val maxShare = pairs.map(_._2).max.toDouble / total
      assert(maxShare < 0.5, f"hottest task emitted $maxShare%.2f of all pairs")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("clusters that fit one chunk keep the direct join (grid relations empty)") {
    val plan = SimilarityQueries.semPairs(assigned(10, 10), chunkSize = 1024)
    assert(plan.count() === 45L) // c(10,2), singletons contribute nothing
    val got = plan.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got === bruteForce(10, 10))
  }
}

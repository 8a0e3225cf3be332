package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** Randomized (ScalaCheck) equivalence of the two distributed pair
  * generators against brute force — the r10 verdict's #5: HotClusterSpec
  * and DegenerateBucketSpec pin FIXED geometries (120/200 clusters,
  * 300-member buckets), but the off-diagonal orientation logic in
  * `semPairs` (a/b roles fixed by chunk, not id; dedup only on the
  * diagonal) and the chunk salting in `bucketPairs` are exactly the kind
  * of code a random probe breaks first. Sizes are capped (N ≤ ~400 rows
  * per trial) so the suite stays in the default run — no Slow tag.
  *
  * Properties checked per random (geometry, chunkSize):
  *   - pair SET equality with brute force (nothing lost, nothing
  *     invented, no duplicates);
  *   - ordering invariant id_a < id_b;
  *   - for semPairs, VECTOR integrity: va/vb belong to id_a/id_b even
  *     when the grid's chunk roles flip the join orientation.
  */
class PairPropertySpec extends SparkSpec {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12)
    .withWorkers(1)
    .withMaxDiscardRatio(1f)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // --- semPairs ------------------------------------------------------------

  // cluster-size list skewed toward one hot cluster (the case the triangle
  // grid exists for), plus singletons and empties
  private val semGeometry: Gen[(List[Int], Int)] = for {
    nClusters <- Gen.choose(0, 6)
    sizes <- Gen.listOfN(nClusters, Gen.frequency(
      3 -> Gen.choose(1, 6),
      2 -> Gen.choose(7, 30),
      1 -> Gen.choose(60, 150))) // overflows several chunks at small sizes
    chunkSize <- Gen.choose(2, 16)
  } yield (sizes.take(6), chunkSize)

  test("semPairs equals brute force on random cluster geometries") {
    check("semPairs", Prop.forAll(semGeometry) { case (sizes, chunkSize) =>
      // vec_id unique across the corpus; vector = [vec_id] so integrity
      // of the (id, vector) pairing is checkable from the id alone
      val rows = sizes.zipWithIndex.flatMap { case (sz, cid) =>
        val base = sizes.take(cid).map(_.toLong).sum
        (1L to sz.toLong).map(i => (cid, base + i, Seq((base + i).toDouble)))
      }
      val df = rows.toDF("cid", "vec_id", "v")
      val got = SimilarityQueries.semPairs(df, chunkSize = chunkSize)
        .select("cid", "id_a", "va", "id_b", "vb")
        .as[(Int, Long, Seq[Double], Long, Seq[Double])].collect().toSeq
      val expected = rows.groupBy(_._1).values.flatMap { members =>
        val ids = members.map(_._2).sorted
        for { a <- ids; b <- ids if a < b } yield (members.head._1, a, b)
      }.toSet
      val gotKeys = got.map { case (cid, a, _, b, _) => (cid, a, b) }
      (gotKeys.size == gotKeys.toSet.size) :| "duplicate pair" &&
        (gotKeys.toSet == expected) :| s"pair set mismatch" &&
        got.forall { case (_, a, _, b, _) => a < b } :| "id order" &&
        got.forall { case (_, a, va, b, vb) =>
          va == Seq(a.toDouble) && vb == Seq(b.toDouble)
        } :| "vector/id pairing broken by grid orientation"
    })
  }

  // --- bucketPairs ---------------------------------------------------------

  // membership list skewed so bucket 0 runs hot (degenerate-bucket shape);
  // each id joins 1..3 distinct buckets; bucket b maps to
  // (band = b % 3, bkey = b / 3) so bands and keys both vary
  private val lshGeometry: Gen[(Map[Long, List[Int]], Int)] = for {
    nIds <- Gen.choose(0, 120)
    picks <- Gen.listOfN(nIds, Gen.listOfN(3, Gen.frequency(
      4 -> Gen.const(0),
      2 -> Gen.choose(1, 3),
      1 -> Gen.choose(4, 8))))
    nPer <- Gen.listOfN(nIds, Gen.choose(1, 3))
    chunkSize <- Gen.choose(2, 8)
  } yield (
    picks.zip(nPer).zipWithIndex.map { case ((bs, n), i) =>
      (i + 1).toLong -> bs.take(n).distinct
    }.toMap,
    chunkSize)

  test("bucketPairs equals brute force on random skewed memberships") {
    check("bucketPairs", Prop.forAll(lshGeometry) { case (membership, chunkSize) =>
      val rows = membership.toSeq.flatMap { case (id, buckets) =>
        buckets.map(b => (id, b % 3, (b / 3).toLong))
      }
      val got =
        if (rows.isEmpty) Set.empty[(Long, Long)]
        else SimilarityQueries
          .bucketPairs(rows.toDF("id", "band", "bkey"), chunkSize = chunkSize)
          .as[(Long, Long)].collect().toSet
      val byBucket = rows.groupBy(r => (r._2, r._3)).values
      val expected = byBucket.flatMap { members =>
        val ids = members.map(_._1).distinct.sorted
        for { a <- ids; b <- ids if a < b } yield (a, b)
      }.toSet
      (got == expected) :| {
        val missing = expected -- got
        val extra = got -- expected
        s"pair set mismatch: missing=${missing.take(5)} extra=${extra.take(5)}"
      } && got.forall { case (a, b) => a < b } :| "id order"
    })
  }
}

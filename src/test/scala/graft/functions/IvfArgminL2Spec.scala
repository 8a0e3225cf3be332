package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ivf_argmin_l2 (the ANN-assisted Lloyd assignment, r16) to the
  * brute argmin_l2 contract it restricts: with every cell probed the two
  * must agree bit-for-bit; with planted well-separated clusters the
  * pruned search still finds the true centroid; an empty probed cell
  * falls back to the full scan instead of returning garbage.
  */
class IvfArgminL2Spec extends SparkSpec {

  import spark.implicits._

  private def mkLayout(cells: Seq[Int], starts: Seq[Int], cids: Seq[Int],
      cvsFlat: Seq[Double], coarseFlat: Seq[Double]) =
    struct(
      typedlit(cells).as("cells"),
      typedlit(starts).as("starts"),
      typedlit(cids).as("cids"),
      typedlit(cvsFlat).as("cvs_flat"),
      typedlit(coarseFlat).as("coarse_flat"))

  test("probing every cell reproduces brute argmin_l2 bit-for-bit") {
    val r = new scala.util.Random(11)
    val dims = 8
    val k = 40
    val cents = (0 until k).map(c => c -> Array.fill(dims)(r.nextGaussian()))
    // coarse = first 6 centroids; group the rest by their nearest coarse
    val coarse = cents.take(6)
    def cell(cv: Array[Double]): Int =
      coarse.indices.minBy(i =>
        coarse(i)._2.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
    val grouped = cents.groupBy(c => cell(c._2)).toSeq.sortBy(_._1)
    val cells = grouped.map(_._1)
    val starts = grouped.scanLeft(0)((acc, g) => acc + g._2.size)
    val ordered = grouped.flatMap(_._2.sortBy(_._1))
    val layout = mkLayout(cells, starts, ordered.map(_._1),
      ordered.flatMap(_._2), coarse.flatMap(_._2))

    val vecs = (0 until 300).map(i => i.toLong -> Array.fill(dims)(r.nextGaussian()))
    // brute side: same ORDERING as the layout so ids/flat stay aligned
    val brute = vecs.toDF("id", "v")
      .withColumn("cids", typedlit(ordered.map(_._1)))
      .withColumn("flat", typedlit(ordered.flatMap(_._2)))
      .select(col("id"),
        IvfArgminL2.ivf_argmin_l2(col("v"), layout, nprobe = 6).as("ivf"),
        ArgminL2.argmin_l2(spark, "v", "cids", "flat").as("brute"))
      .collect()
    brute.foreach { row =>
      assert(row.getStruct(1) == row.getStruct(2),
        s"id=${row.getLong(0)}: ivf ${row.getStruct(1)} != brute ${row.getStruct(2)}")
    }
  }

  test("zero-length vector matches ArgminL2: first centroid at dist2 0") {
    // r16 ADVICE: the dims==0 branch returned null while brute argmin_l2
    // degenerates every distance to 0.0 and keeps the first centroid —
    // the bit-for-bit contract must hold on empty input too
    val layout = mkLayout(
      cells = Seq(0, 1), starts = Seq(0, 1, 2), cids = Seq(3, 8),
      cvsFlat = Seq(1.0, 1.0, 2.0, 2.0),
      coarseFlat = Seq(0.0, 0.0, 5.0, 5.0))
    val row = Seq(Tuple1(Seq.empty[Double])).toDF("v")
      .withColumn("cids", typedlit(Seq(3, 8)))
      .withColumn("flat", typedlit(Seq(1.0, 1.0, 2.0, 2.0)))
      .select(IvfArgminL2.ivf_argmin_l2(col("v"), layout, nprobe = 1).as("ivf"),
        ArgminL2.argmin_l2(spark, "v", "cids", "flat").as("brute"))
      .collect()(0)
    assert(!row.isNullAt(0), "empty vector must not map to null")
    assert(row.getStruct(0) == row.getStruct(1),
      s"ivf ${row.getStruct(0)} != brute ${row.getStruct(1)}")
  }

  test("empty probed cell falls back to the full scan (totality)") {
    // two coarse centers; ALL centroids live in cell 1; a query at coarse
    // center 0 probes only the empty cell with nprobe=1 — the fallback
    // must still return the true global argmin
    val layout = mkLayout(
      cells = Seq(1), starts = Seq(0, 2), cids = Seq(7, 9),
      cvsFlat = Seq(10.0, 10.0, 20.0, 20.0),
      coarseFlat = Seq(0.0, 0.0, 15.0, 15.0))
    val r = Seq(Tuple1(Seq(0.1, 0.1))).toDF("v")
      .select(IvfArgminL2.ivf_argmin_l2(col("v"), layout, nprobe = 1).as("m"))
      .collect()(0).getStruct(0)
    assert(r.getInt(0) == 7, s"fallback picked ${r.getInt(0)}, want 7")
  }

  test("planted tight clusters: pruned assignment equals brute assignment") {
    // 6 well-separated anchors, 40 members each with tiny jitter — the
    // geometry ANN assignment must not miss
    val r = new scala.util.Random(3)
    val anchors = (0 until 6).map(a => Array.fill(16)(r.nextGaussian() * 10))
    val vecs = (for {
      a <- 0 until 6
      m <- 0 until 40
    } yield (a * 40L + m,
      anchors(a).map(x => (x + r.nextGaussian() * 0.01).toFloat))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfassign").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val brute = graft.similarity.SimilarityQueries
      .kmAssigned(spark, dir, kOverride = Some(12))
      .select("vec_id", "cid").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    val ann = graft.similarity.SimilarityQueries
      .kmAssigned(spark, dir, kOverride = Some(12), annProbe = Some(4))
      .select("vec_id", "cid").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    val agree = brute.count { case (id, c) => ann(id) == c }
    assert(agree >= (brute.size * 0.95).toInt,
      s"ANN assignment diverged on ${brute.size - agree}/${brute.size} vectors")
    // determinism: a second run is identical
    val ann2 = graft.similarity.SimilarityQueries
      .kmAssigned(spark, dir, kOverride = Some(12), annProbe = Some(4))
      .select("vec_id", "cid").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(ann == ann2)
  }
}

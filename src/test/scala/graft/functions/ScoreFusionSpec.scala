package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The per-doc scoring fusions equal the relational finishers they
  * replaced, bit-for-bit:
  *
  *   - vec_sum ≡ posexplode + groupBy(pos) + sum, ragged/empty included;
  *   - DsirScore ≡ filter(cnt>0) → join λ → round(·,12) →
  *     cast decimal(28,12) → sum → cast double (q79's finisher);
  *   - BigramScore ≡ explode → left-join cb/cu → per-term
  *     round(cnt·ln((cb+1)/(cu+v)),12) decimal sum + oov flags (q80's
  *     finisher).
  *
  * These equalities (plus the λ/StrictMath.log note at the q79 call
  * site) are what keeps the string-keyed DuckDB oracles valid for the
  * fused plans.
  */
class ScoreFusionSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(90210)

  test("vec_sum equals posexplode + groupBy(pos) sums; ragged zero-pads") {
    val data = Seq(
      Array(1L, 2L, 3L), Array(10L, 0L, 5L), Array(7L), Array.empty[Long],
      Array(0L, 0L, 0L, 9L)) ++
      (0 until 50).map(_ => Array.fill(rnd.nextInt(6))(rnd.nextInt(100).toLong))
    val df = data.map(Tuple1(_)).toDF("v")
    val got = df.agg(LongVecSum.vec_sum(col("v")).as("s"))
      .head.getSeq[Long](0)
    val maxLen = data.map(_.length).max
    val want = (0 until maxLen).map(k =>
      data.map(a => if (k < a.length) a(k) else 0L).sum)
    assert(got === want)
    // empty input group
    val empty = df.filter(lit(false)).agg(LongVecSum.vec_sum(col("v")))
      .head.getSeq[Long](0)
    assert(empty === Seq.empty[Long])
  }

  test("DsirScore equals the relational decimal finisher") {
    val b = 32
    val lam = Array.fill(b)(rnd.nextDouble() * 14.0 - 7.0)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(b)(math.max(0L, rnd.nextInt(12) - 5L))))
    val df = vecs.toDF("doc_id", "bc")
    val lamDf = lam.zipWithIndex.map { case (l, k) => (k, l) }.toSeq
      .toDF("bucket", "lam")
    val relational = df
      .select(col("doc_id"), posexplode(col("bc")).as(Seq("bucket", "cnt")))
      .filter(col("cnt") > 0)
      .join(broadcast(lamDf), "bucket")
      .select(col("doc_id"),
        round(col("cnt").cast("double") * col("lam"), 12)
          .cast("decimal(28,12)").as("term"))
      .groupBy("doc_id").agg(sum("term").as("lw"))
      .select(col("doc_id"), col("lw").cast("double").as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = df.select(col("doc_id"),
      DsirScore.dsir_score(col("bc"), lam).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((k, w) <- fused) {
      // docs with all-zero vectors are absent relationally; fused gives 0.0
      assert(relational.getOrElse(k, 0.0) === w, s"doc $k")
    }
  }

  test("BigramScore equals the relational LM finisher incl. OOV") {
    val v = 37L
    // synthetic transition tables: some hb/hp in the model, some OOV
    val model = (0 until 40).map(i => (i.toLong * 7, 1L + rnd.nextInt(20)))
    val cbM = BigramScore.broadcastModel(spark, model.toArray)
    val cuModel = (0 until 25).map(i => (i.toLong * 11, 1L + rnd.nextInt(40)))
    val cuM = BigramScore.broadcastModel(spark, cuModel.toArray)
    val docs = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(8)
      (i.toLong, (0 until n).map { _ =>
        (rnd.nextInt(40).toLong * 11, rnd.nextInt(60).toLong * 7,
          1L + rnd.nextInt(3))
      })
    }
    val df = docs.toDF("doc_id", "bgc")
      .select(col("doc_id"), col("bgc").cast(
        "array<struct<hp:bigint,hb:bigint,cnt:bigint>>").as("bgc"))
    val cbDf = model.toDF("hb", "cb")
    val cuDf = cuModel.toDF("hp", "cu")
    val relational = df
      .select(col("doc_id"), explode(col("bgc")).as("e"))
      .select(col("doc_id"), col("e.hp").as("hp"), col("e.hb").as("hb"),
        col("e.cnt").as("cnt"))
      .join(broadcast(cbDf), Seq("hb"), "left")
      .join(broadcast(cuDf), Seq("hp"), "left")
      .select(col("doc_id"), col("cnt"),
        round(col("cnt").cast("double") *
          log((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
            (coalesce(col("cu"), lit(0L)) + lit(v)).cast("double")), 12)
          .cast("decimal(28,12)").as("term"),
        when(col("cb").isNull, col("cnt")).otherwise(0L).as("oov"))
      .groupBy("doc_id")
      .agg(sum("term").as("slp"), sum("cnt").as("tn"), sum("oov").as("noov"))
      .select(col("doc_id"), col("slp").cast("double").as("slp"),
        col("tn"), col("noov"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    val fused = df.select(col("doc_id"),
      BigramScore.bigram_score(col("bgc"), cbM, cuM, v).as("sc"))
      .select(col("doc_id"), col("sc.slp"), col("sc.tn"), col("sc.noov"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(fused.keySet === relational.keySet)
    for ((k, got) <- fused) assert(got === relational(k), s"doc $k")
  }

  test("Catalyst log() is StrictMath.log (the BigramScore parity premise)") {
    val xs = Seq(1e-300, 0.1, 0.5, 1.0 + 1e-15, 2.0, math.Pi, 1e5, 7.03e17)
    val got = xs.toDF("x").select(log(col("x")).as("l")).collect().map(_.getDouble(0))
    val want = xs.map(StrictMath.log)
    assert(got.toSeq === want,
      "Spark's Log no longer evaluates StrictMath.log — update BigramScore/q79 λ")
  }
}

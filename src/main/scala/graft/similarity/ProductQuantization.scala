package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou, Douze, Schmid, TPAMI 2011) — the
  * missing rung between q87's scalar quantization and a full IVF-PQ
  * stack: split each vector into M subspaces, train a tiny K-centroid
  * codebook per subspace (Lloyd, q69's deterministic conventions), store
  * each vector as M single-byte codes, and answer queries by asymmetric
  * distance computation (ADC): per query, ONE M×K table of exact
  * query-subvector-to-centroid distances, then every candidate's
  * approximate distance is M table lookups summed — no per-candidate
  * float dot product at all.
  *
  * Scale story (the reason PQ is the 100 TB ANN workhorse): the candidate
  * side carries M bytes per vector (64 floats → 4 bytes here, a 64×
  * storage/bandwidth shrink vs float32, 16× vs q87's int8) and the
  * per-query work is a table-lookup sum, so the scan is code-bound, not
  * FLOP-bound. The codebook relation is M·K rows (64 here) and
  * BROADCASTS; Lloyd's update is one map-side-combinable groupBy of
  * (sub, cid, dim, element) rows per round (q69's decimal-mean trick, so
  * centroids are bit-identical at any parallelism); the ADC join
  * broadcasts the M·K·|Q| distance table and the sum is M rounded-6dp
  * DECIMAL(18,6) terms — order-free, which is what lets DuckDB reproduce
  * the ranking cell-exact. Recall versus the exact ranking is pinned by
  * ProductQuantizationSpec (PQ is lossy by design; the spec pins HOW
  * lossy on the sf corpus).
  *
  * Deterministic by construction, q69/q49 conventions throughout:
  * centroids init from the first K vectors' subvectors, distances rounded
  * 6dp BEFORE every argmin/rank with ties on cid/vec_id.
  */
object ProductQuantization {

  val PqSubspaces = 4 // M: 64-dim corpus vectors → 16-dim subvectors
  val PqK = 16        // centroids per subspace → 4-bit codes (demo scale;
                      // production PQ uses K=256 for byte codes — K only
                      // changes the codebook relation size, not the plan)
  val PqIters = 1     // unrolled Lloyd rounds per subspace
  val PqTopK = 3      // q40's top-k convention
  val PqNQueries = 5  // q40's query set: vec_id < 5

  private def l2sq6(s: SparkSession, a: String, b: String): Column =
    round(graft.functions.L2Distance.l2_sq(s, a, b), 6)

  /** (vec_id, sub, sv): each vector split into M contiguous subvectors —
    * sublen derived in-row from the array length so Spark and the
    * generated SQL cannot disagree on the split.
    */
  private def subVectors(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(PqSubspaces - 1))).as("sub"),
        expr(s"slice(v, sub * (size(v) div $PqSubspaces) + 1," +
          s" size(v) div $PqSubspaces)").as("sv"))

  /** Codebooks (sub, cid, cv) after PqIters Lloyd rounds, plus the fitted
    * codes (vec_id, sub, cid). One relation keyed by `sub` trains all M
    * codebooks in the same jobs — no per-subspace plan duplication.
    *
    * r17 (job-floor cut + the r15 argmin lesson applied to the PQ fit):
    * the ≤M·K-row codebook lives DRIVER-LOCAL between rounds — it always
    * round-tripped the driver inside each broadcast build anyway — so a
    * Lloyd round is exactly ONE action (the update mean collect), with
    * broadcasts of the codebook costing no job (LocalRelation collects
    * driver-side). The assignment itself moves from
    * `join(broadcast(cents)) + groupBy(vec_id, sub).agg(min(struct(...)))`
    * — a struct-with-array buffer that plans as Sort + SortAggregate over
    * N·K subvector-payload rows, the exact q69 199-s scale trap r15
    * documented — to the native per-row `argmin_l2` over a per-sub
    * flattened codebook: candidates are scanned inside the row, the sv
    * payload never enters an aggregate, and the pass is exchange-free.
    * Selection is identical by construction: min(struct(dist2, cid, sv))
    * ranks by (dist2, cid) — every joined copy carries the same sv — and
    * argmin_l2 computes the same in-order 6dp-rounded distance with the
    * same cid tie-break (its contract, pinned by ArgminL2Spec).
    */
  private[similarity] type SubCents = Array[(Int, Int, Array[Double])] // (sub, cid, cv)
  private def subCentsDf(s: SparkSession, cents: SubCents): DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // one row per SUBSPACE: (sub, cids, cvs_flat) — the argmin_l2 layout
    val rows = cents.groupBy(_._1).toSeq.sortBy(_._1).map { case (sub, cs) =>
      val sorted = cs.sortBy(_._2)
      org.apache.spark.sql.Row(sub,
        sorted.map(_._2).toSeq, sorted.flatMap(_._3).toSeq)
    }
    s.createDataFrame(rows.asJava, StructType(Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("cids", ArrayType(IntegerType, containsNull = false)),
      StructField("cvs_flat", ArrayType(DoubleType, containsNull = false)))))
  }
  private[similarity] def fitLocal(s: SparkSession, d: String)
      : (SubCents, DataFrame) = {
    val subv = subVectors(s, d)
    def assign(cents: SubCents): DataFrame =
      subv.join(broadcast(subCentsDf(s, cents)), Seq("sub"))
        .select(col("vec_id"), col("sub"),
          graft.functions.ArgminL2.argmin_l2(s, "sv", "cids", "cvs_flat")
            .getField("cid").as("cid"),
          col("sv"))
    def update(assigned: DataFrame): SubCents = {
      val rows = assigned
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("sub", "cid", "dim")
        .agg((sum(round(col("x"), 12).cast("decimal(28,12)")).cast("double")
          / count(lit(1))).as("m"))
        .collect()
      rows.groupBy(r => (r.getInt(0), r.getInt(1))).toArray
        .sortBy(_._1).map { case ((sub, cid), rs) =>
          (sub, cid, rs.sortBy(_.getInt(2)).map(_.getDouble(3)))
        }
    }
    // AQE off for the fit-internal actions (r18, see graft.withAqeOff):
    // init collect + per-round update shuffles are <= M·K·d slim rows at
    // any scale; the final assignment executes outside, under AQE.
    val cents: SubCents = graft.withAqeOff(s) {
      var c: SubCents = subv.filter(col("vec_id") < PqK)
        .select(col("sub"), col("vec_id").cast("int").as("cid"), col("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        .sortBy(c0 => (c0._1, c0._2))
      for (_ <- 1 to PqIters) c = update(assign(c))
      c
    }
    (cents, assign(cents).select(col("vec_id"), col("sub"), col("cid")))
  }
  /** Relational view of the fitted codebooks + codes — the pre-r17
    * signature, kept for callers that consume cents as a DataFrame.
    */
  private[similarity] def fit(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (cents, codes) = fitLocal(s, d)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val centsDf = s.createDataFrame(
      cents.map(c => org.apache.spark.sql.Row(c._1, c._2, c._3.toSeq)).toSeq.asJava,
      StructType(Seq(
        StructField("sub", IntegerType, nullable = false),
        StructField("cid", IntegerType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false)))))
    (centsDf, codes)
  }

  // ---------------------------------------------------------------------------
  // q90 — PQ-ADC top-k: q40's query set (vec_id < 5, top 3, self excluded)
  // answered from codes + one broadcast distance table. `adc` sums M
  // rounded-6dp DECIMAL(18,6) lookups — exact and order-free, so the
  // (adc, nid) ranking is identical in both engines.
  val q90PqAnn: Q = (s, d) => {
    val (centsLocal, codes) = fitLocal(s, d)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    // LocalRelation: broadcasting it costs no job (driver-side collect)
    val cents = s.createDataFrame(
      centsLocal.map(c => org.apache.spark.sql.Row(c._1, c._2, c._3.toSeq))
        .toSeq.asJava,
      StructType(Seq(
        StructField("sub", IntegerType, nullable = false),
        StructField("cid", IntegerType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false)))))
    val qsub = subVectors(s, d).filter(col("vec_id") < PqNQueries)
      .select(col("vec_id").as("qid"), col("sub"), col("sv"))
    val dt = qsub.join(broadcast(cents), Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"),
        l2sq6(s, "sv", "cv").as("dd")) // |Q|·M·K rows, data-independent
    val w = Window.partitionBy("qid").orderBy(asc("adc"), asc("nid"))
    codes.join(broadcast(dt), Seq("sub", "cid"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id").as("nid"))
      .agg(sum(col("dd").cast("decimal(18,6)")).cast("double").as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= PqTopK)
      .select("qid", "rank", "nid", "adc")
      .orderBy("qid", "rank")
  }

  // Oracle: the same fit, generated so constants cannot drift.
  private def sqL2(a: String, b: String): String =
    s"""round((SELECT sum((z.a - z.b) * (z.a - z.b))
       |       FROM (SELECT unnest($a) AS a, unnest($b) AS b) z), 6)""".stripMargin
  private def assignCte(i: Int, cents: String): String =
    s"""sc$i AS (
       |  SELECT e.vec_id, e.sub, e.sv, c.cid, ${sqL2("e.sv", "c.cv")} AS dist2
       |  FROM subv e JOIN $cents c ON e.sub = c.sub),
       |a$i AS (
       |  SELECT vec_id, sub, sv, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY dist2, cid) AS rk FROM sc$i)
       |  WHERE rk = 1)""".stripMargin
  private def updateCte(i: Int): String =
    s"""dx$i AS (
       |  SELECT sub, cid, unnest(range(len(sv))) AS d, sv FROM a$i),
       |dm$i AS (
       |  SELECT sub, cid, d,
       |    CAST(sum(CAST(round(sv[d + 1], 12) AS DECIMAL(28,12))) AS DOUBLE)
       |      / count(*) AS m
       |  FROM dx$i GROUP BY sub, cid, d),
       |c$i AS (SELECT sub, cid, list(m ORDER BY d) AS cv FROM dm$i GROUP BY sub, cid)""".stripMargin

  val q90Sql: String = {
    val rounds = (1 to PqIters)
      .map(i => assignCte(i, if (i == 1) "c0" else s"c${i - 1}") + ",\n" +
        updateCte(i))
      .mkString(",\n")
    s"""WITH embd AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |subv AS (
       |  SELECT vec_id, sub,
       |    v[sub * (len(v) // $PqSubspaces) + 1 :
       |      (sub + 1) * (len(v) // $PqSubspaces)] AS sv
       |  FROM embd CROSS JOIN (SELECT unnest(range($PqSubspaces)) AS sub)),
       |c0 AS (
       |  SELECT sub, CAST(vec_id AS INTEGER) AS cid, sv AS cv
       |  FROM subv WHERE vec_id < $PqK),
       |$rounds,
       |${assignCte(PqIters + 1, s"c$PqIters")},
       |qs AS (SELECT vec_id AS qid, sub, sv FROM subv WHERE vec_id < $PqNQueries),
       |dt AS (
       |  SELECT q.qid, c.sub, c.cid, ${sqL2("q.sv", "c.cv")} AS dd
       |  FROM qs q JOIN c$PqIters c ON q.sub = c.sub),
       |adc AS (
       |  SELECT t.qid, a.vec_id AS nid,
       |    CAST(sum(CAST(t.dd AS DECIMAL(18,6))) AS DOUBLE) AS adc
       |  FROM a${PqIters + 1} a JOIN dt t ON a.sub = t.sub AND a.cid = t.cid
       |  WHERE t.qid <> a.vec_id
       |  GROUP BY t.qid, a.vec_id),
       |ranked AS (
       |  SELECT qid, nid, adc,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rank
       |  FROM adc)
       |SELECT qid, rank, nid, adc FROM ranked WHERE rank <= $PqTopK
       |ORDER BY qid, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q90_pq_ann" -> q90PqAnn)

  val oracles: Map[String, String] = Map(
    "q90_pq_ann" -> q90Sql)
}

package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantized (int8) similarity search — the memory/bandwidth scale
  * path for the brute-force ANN baseline (q40). Per-vector symmetric
  * quantization: scale = 127/max|v|, q_i = floor(v_i*scale + 0.5), stored
  * as `array<tinyint>` so every exchanged/broadcast row carries 1 byte per
  * dimension instead of 4 (float) — at 100 TB of embeddings the candidate
  * side is scan-bound and the query side broadcast shrinks 4×, which is
  * the difference between a fits-in-memory broadcast and a shuffle. The
  * per-vector scales cancel inside cosine, so the quantized score is
  * computable from the int arrays alone: dot and norms are EXACT int64
  * sums (order-free — no float accumulation nondeterminism anywhere
  * before the final division), making the whole path oracle-checkable
  * cell-exact, unlike a float-dot approximation.
  *
  * Everything is higher-order column expressions (transform / zip_with /
  * aggregate) inside whole-stage codegen — no UDF, no custom expression
  * needed: the fused loops Catalyst generates for int multiply-add are
  * already the tight shape.
  *
  * Quality contract: int8 symmetric quantization perturbs each cosine by
  * O(1/127) relative; QuantizedAnnSpec measures recall@3 against q40's
  * exact ranking on the sf corpus and pins the floor. Reference scope:
  * the ANN surface of the reference's similarity service (same family as
  * q40/q49/q51) with the quantized storage every production vector store
  * (FAISS SQ8 et al.) ships.
  */
object QuantizedAnn {

  /** q_i = floor(v_i * 127 / max|v| + 0.5) as tinyint; the 1e-30 guard
    * keeps an all-zero vector at qv = zeros instead of NaN.
    */
  private def quantize(emb: Column): Column = {
    val m = greatest(array_max(transform(emb, x => abs(x.cast("double")))),
      lit(1e-30))
    transform(emb, x =>
      floor(x.cast("double") * lit(127.0) / m + lit(0.5)).cast("tinyint"))
  }

  /** Σ q_i² as exact int64 (tinyint widened before the multiply — ANSI
    * tinyint*tinyint would overflow at 128²).
    */
  private def qnorm(qv: Column): Column =
    aggregate(qv, lit(0L), (acc, x) => acc + x.cast("long") * x.cast("long"))

  // ---------------------------------------------------------------------------
  // q87 — int8 brute-force cosine top-k: q40's query set (vec_id < 5, top 3
  // neighbors each) on quantized vectors. Rounded to 6dp BEFORE ranking so
  // Spark and DuckDB rank identical values identically (the q40 rule).
  val q87Int8Ann: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", qnorm(col("qv")))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("qa"), col("qn").as("na"))
    val cand = emb
      .select(col("vec_id").as("nid"), col("qv").as("qb"), col("qn").as("nb"))
    val dot = aggregate(
      zip_with(col("qa"), col("qb"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("qid").orderBy(desc("cosine_q"), asc("nid"))
    cand.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", dot) // named column => codegen shares one evaluation
      .withColumn("cosine_q",
        when(col("na") > 0 && col("nb") > 0,
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6))
          .otherwise(lit(null).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "nid", "cosine_q")
      .orderBy("qid", "rank")
  }

  val q87Sql: String =
    """WITH base AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(
      |      CAST(x AS DOUBLE) * 127.0 / greatest(
      |        list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))),
      |        1e-30) + 0.5) AS TINYINT)) AS qv
      |  FROM embeddings),
      |normed AS (
      |  SELECT vec_id, qv,
      |    (SELECT sum(CAST(a AS BIGINT) * CAST(a AS BIGINT))
      |     FROM (SELECT unnest(qv) AS a)) AS qn
      |  FROM base),
      |q AS (SELECT vec_id AS qid, qv AS qa, qn AS na FROM normed WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.qid, n.vec_id AS nid,
      |    CASE WHEN q.na > 0 AND n.qn > 0 THEN
      |      round(
      |        CAST((SELECT sum(CAST(a AS BIGINT) * CAST(b AS BIGINT))
      |              FROM (SELECT unnest(q.qa) AS a, unnest(n.qv) AS b)) AS DOUBLE)
      |        / (sqrt(CAST(q.na AS DOUBLE)) * sqrt(CAST(n.qn AS DOUBLE))), 6)
      |    END AS cosine_q
      |  FROM normed n CROSS JOIN q WHERE n.vec_id <> q.qid),
      |ranked AS (
      |  SELECT qid, nid, cosine_q,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine_q DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, rank, nid, cosine_q FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  val queries: Map[String, Q] = Map(
    "q87_int8_ann" -> q87Int8Ann)

  val oracles: Map[String, String] = Map(
    "q87_int8_ann" -> q87Sql)
}

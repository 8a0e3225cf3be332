package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + near-duplicate detection over `embeddings` and
  * `documents` — the vector-index side of the reference
  * (`src/services/vector_indexer/indexer.py`: embeddings over event chunks,
  * rebuildable batch index) re-expressed as Spark-native batch operators,
  * plus the LSH family a 100 TB dedup pipeline needs.
  *
  * Scale design:
  *   - brute-force cosine is the CORRECTNESS baseline: broadcast the (small)
  *     query set, stream the candidate side, per-partition top-k via window;
  *   - the scale path is LSH bucketing (MinHash bands for Jaccard, bit-
  *     sampled SimHash for cosine): candidates meet only inside buckets, so
  *     the quadratic blowup is confined to bucket-local joins;
  *   - dot products are higher-order-function folds over the array column —
  *     sequential, deterministic, no UDF serialization.
  */
object SimilarityQueries {

  /** Deterministic double dot-product of two float-array columns. */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  // ---------------------------------------------------------------------------
  // q40 — brute-force cosine top-k ANN baseline: 3 nearest neighbors for each
  // query vector (vec_id < 5) across the whole table. Query side broadcast;
  // ranking via per-query window on the rounded score (rounded BEFORE ranking
  // so Spark and DuckDB rank identical values identically).
  val q40CosineTopK: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cand = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val scored = cand.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cosine",
        round(dot(col("qvec"), col("nvec")) / (norm(col("qvec")) * norm(col("nvec"))), 6))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }
  val q40Sql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.qid, e.vec_id AS nid,
      |    round(
      |      (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT unnest(q.qvec) AS x, unnest(e.embedding) AS y))
      |      / (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM (SELECT unnest(q.qvec) AS x)))
      |       * sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) FROM (SELECT unnest(e.embedding) AS y)))),
      |      6) AS cosine
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT qid, nid, cosine,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------------------
  // q41 — embedding-cosine near-duplicate pairs: all pairs above a cosine
  // threshold among a blocked subset (vec_id < 100 at any sf — keeps the
  // oracle quadratic bounded; the full-scale path is q43's LSH bucketing).
  val q41CosinePairs: Q = (s, d) => {
    val a = Tables.embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = Tables.embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(dot(col("vec_a"), col("vec_b")) / (norm(col("vec_a")) * norm(col("vec_b"))), 6))
      .filter(col("cosine") >= 0.35)
      .select("id_a", "id_b", "cosine")
      .orderBy("id_a", "id_b")
  }
  val q41Sql: String =
    """WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(
      |    (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |     FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
      |    / (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM (SELECT unnest(a.embedding) AS x)))
      |     * sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) FROM (SELECT unnest(b.embedding) AS y)))),
      |    6) AS cosine
      |FROM sub a JOIN sub b ON a.vec_id < b.vec_id
      |WHERE round(
      |    (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |     FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
      |    / (sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM (SELECT unnest(a.embedding) AS x)))
      |     * sqrt((SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) FROM (SELECT unnest(b.embedding) AS y)))),
      |    6) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------------
  // q42 — MinHash signatures (the scale path for Jaccard near-dup): 3-token
  // shingles → 16 independent hash slots via xxhash64(shingle, seed) → min
  // per slot. Pure expressions, deterministic; LSH banding joins on
  // band-hash so only bucket collisions are compared. Not SQL-expressible in
  // the oracle (no xxhash64) — rows-only check; semantics covered by
  // MinHashSpec + q43's verified pairs.
  private val NumHashes = 16
  private val BandSize = 4

  /** Adds a `shingles` column: the distinct 3-token shingle set of `text`.
    *
    * The token array is bound as a real column first, and shingles come from
    * zipping three shifted slices — NOT from element_at inside a transform
    * lambda over an inlined split(): optimizer inlining re-evaluates split()
    * per lambda element, turning shingling O(n²) per document (measured ~9×
    * slower at sf0.1). Keeps docs with >= 3 tokens.
    */
  def withShingles(docs: DataFrame): DataFrame = {
    val t = col("__toks")
    val n = size(t)
    docs
      .withColumn("__toks", split(col("text"), " "))
      .filter(n >= 3)
      .withColumn("shingles", array_distinct(transform(
        arrays_zip(slice(t, lit(1), n - 2), slice(t, lit(2), n - 2),
          slice(t, lit(3), n - 2)),
        z => concat_ws(" ", z("0"), z("1"), z("2")))))
      .drop("__toks")
  }

  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sig = array((0 until NumHashes).map { h =>
      array_min(transform(col("shingles"), sh => xxhash64(lit(h), sh)))
    }: _*)
    withShingles(docs).withColumn("minhash", sig)
  }

  val q42MinhashSig: Q = (s, d) =>
    minhashSignatures(Tables.documents(s, d))
      .select(col("doc_id"), col("minhash"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------------------
  // q43 — MinHash-LSH candidate pairs + exact Jaccard verification: band the
  // signature (16 hashes → 4 bands of 4), bucket-join on (band, band-hash),
  // then verify candidates with exact shingle Jaccard. At 100 TB only the
  // 8-byte band hashes shuffle; documents are re-joined for the (rare)
  // verification step.
  val q43MinhashPairs: Q = (s, d) => {
    // Shape chosen for scale AND single-pass efficiency:
    //   1. signature pipeline runs ONCE (no self-join over it — a self-join
    //      would recompute the signatures on both sides or force a persist
    //      whose concurrent-broadcast fill serializes, measured 5-20× slower);
    //   2. only slim (doc_id, band, band_hash) rows shuffle; pairs within a
    //      bucket come from groupBy + collect_list + array combinatorics —
    //      bucket membership is small by construction (that's the point of
    //      banding), so c(k,2) per bucket is bounded;
    //   3. exact-Jaccard verification re-derives shingles from `documents`
    //      only for the (rare) surviving candidate pairs via two broadcast
    //      joins of the tiny pair set against the base table.
    val banded = minhashSignatures(Tables.documents(s, d))
      .select(col("doc_id"),
        posexplode(array((0 until NumHashes / BandSize).map { b =>
          hash(slice(col("minhash"), b * BandSize + 1, BandSize))
        }: _*)).as(Seq("band", "band_hash")))
    val ids = sort_array(collect_list(col("doc_id")))
    val pairs = banded.groupBy("band", "band_hash")
      .agg(ids.as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, greatest(size(col("ids")) - i - 1, lit(0))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val docShingles = withShingles(Tables.documents(s, d))
    pairs
      .join(docShingles.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(docShingles.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / col("uni").cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------------------
  // q44 — SimHash (64-bit) near-dup signatures: per-token xxhash64, each of
  // the 64 bits votes +1/-1, sign of the vote is the signature bit.
  // Expressed as an explode + bit-vote aggregation (map-side combinable).
  val q44Simhash: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val votes: Seq[org.apache.spark.sql.Column] = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"b$b")
    }
    val voted = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    voted.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q40_cosine_topk" -> q40CosineTopK,
    "q41_cosine_pairs" -> q41CosinePairs,
    "q42_minhash_signatures" -> q42MinhashSig,
    "q43_minhash_lsh_pairs" -> q43MinhashPairs,
    "q44_simhash" -> q44Simhash)

  /** q42/q43/q44 hash with xxhash64 (not available in DuckDB) — rows-only. */
  val oracles: Map[String, String] = Map(
    "q40_cosine_topk" -> q40Sql,
    "q41_cosine_pairs" -> q41Sql)
}

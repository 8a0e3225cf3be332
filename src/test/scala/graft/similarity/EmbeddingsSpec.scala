package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {

  import spark.implicits._

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  /** Distributional fixture: "cat" and "dog" occur in identical contexts
    * (never together), "coin" lives in a disjoint context family. A model
    * that captures distributional similarity must place cat≈dog despite
    * ZERO co-occurrence — the property token hashing cannot have.
    */
  private def corpus = (
    (1 to 30).map(i => s"the cat runs fast chasing toy$i") ++
      (1 to 30).map(i => s"the dog runs fast chasing toy$i") ++
      (1 to 30).map(i => s"market coin price rises trading day$i") ++
      (1 to 30).map(i => s"the cat sleeps warm blanket net$i") ++
      (1 to 30).map(i => s"the dog sleeps warm blanket net$i"))
    .toDF("text")

  private val cfg = Embeddings.Config(
    dim = 8, window = 2, vocabSize = 256, minCount = 2, iters = 10, seed = 7)

  test("vocabulary: frequency-ranked dense ids, minCount floor") {
    val v = Embeddings.vocabulary(
      Seq("a a a b b c", "a b x").toDF("text"), "text",
      Embeddings.Config(minCount = 2, vocabSize = 10))
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("n"), r.getAs[Int]("id"))).toMap
    assert(v("a") === (4L, 0))
    assert(v("b") === (3L, 1))
    assert(!v.contains("x")) // below minCount
    assert(!v.contains("c"))
  }

  test("cooccurrence matrix is symmetric and window-bounded") {
    val docs = Seq("a b c d e").toDF("text")
    val vocab = Embeddings.vocabulary(docs, "text",
      Embeddings.Config(minCount = 1, vocabSize = 10))
    val ids = vocab.collect().map(r =>
      r.getAs[Int]("id") -> r.getAs[String]("token")).toMap
    val cooc = Embeddings.cooccurrences(docs, "text", vocab, window = 2)
      .collect()
      .map(r => (ids(r.getAs[Int]("w")), ids(r.getAs[Int]("c"))) -> r.getAs[Long]("n"))
      .toMap
    // symmetric
    assert(cooc.forall { case ((w, c), n) => cooc((c, w)) == n })
    // adjacent + distance-2 present, distance-3 absent
    assert(cooc(("a", "b")) === 1L)
    assert(cooc(("a", "c")) === 1L)
    assert(!cooc.contains(("a", "d")))
  }

  test("ppmi matches the closed form on a tiny matrix") {
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val vocab = Embeddings.vocabulary(docs, "text",
      Embeddings.Config(minCount = 1, vocabSize = 10))
    val ids = vocab.collect().map(r =>
      r.getAs[String]("token") -> r.getAs[Int]("id")).toMap
    val p = Embeddings.ppmi(Embeddings.cooccurrences(docs, "text", vocab, 1))
      .collect()
      .map(r => (r.getAs[Int]("w"), r.getAs[Int]("c")) -> r.getAs[Double]("ppmi"))
      .toMap
    // counts (both directions): (a,b)=2 (a,c)=1; N=6; n(a)=3, n(b)=2, n(c)=1
    val ab = math.log(2.0 * 6 / (3 * 2))
    val ac = math.log(1.0 * 6 / (3 * 1))
    assert(math.abs(p((ids("a"), ids("b"))) - ab) < 1e-12)
    assert(math.abs(p((ids("a"), ids("c"))) - ac) < 1e-12)
  }

  test("factorize returns an orthonormal factor, deterministically") {
    val vocab = Embeddings.vocabulary(corpus, "text", cfg)
    val m = Embeddings.ppmi(Embeddings.cooccurrences(corpus, "text", vocab, cfg.window))
    val q = Embeddings.factorize(m, cfg)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Double](r.fieldIndex("vec"))).toMap
    val d = cfg.dim
    // QᵀQ ≈ I
    for (i <- 0 until d; j <- 0 until d) {
      val s = q.values.map(v => v(i) * v(j)).sum
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-6,
        s"Gram($i,$j) = $s")
    }
    val q2 = Embeddings.factorize(m, cfg)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Double](r.fieldIndex("vec"))).toMap
    assert(q === q2, "same corpus + seed must reproduce identical vectors")
  }

  test("trained space: synonyms (zero co-occurrence) close, unrelated far") {
    val w = Embeddings.train(corpus, "text", cfg)
      .collect().map(r => r.getAs[String]("token") -> r.getSeq[Double](r.fieldIndex("vector"))).toMap
    val catDog = cosine(w("cat"), w("dog"))
    val catCoin = cosine(w("cat"), w("coin"))
    info(f"cosine(cat,dog)=$catDog%.4f cosine(cat,coin)=$catCoin%.4f")
    assert(catDog > 0.8, s"distributional synonyms must align: $catDog")
    assert(catDog > catCoin + 0.3,
      s"synonyms must beat unrelated tokens: $catDog vs $catCoin")
  }

  test("embedWith: mean-of-vectors, OOV dropped, all-OOV row is zero") {
    val model = Seq(
      ("p", Seq(1.0, 0.0)), ("q", Seq(0.0, 1.0))).toDF("token", "vector")
    val rows = Embeddings.embedWith(model,
      Seq((1, "p q"), (2, "p zz"), (3, "zz ww")).toDF("k", "chunk_text"),
      "chunk_text", Seq("k"))
      .collect().map(r => r.getAs[Int]("k") -> r.getSeq[Double](r.fieldIndex("embedding"))).toMap
    val r2 = math.sqrt(2) / 2
    assert(rows(1).zip(Seq(r2, r2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(rows(2) === Seq(1.0, 0.0)) // OOV token ignored, not averaged as zero
    assert(rows(3) === Seq(0.0, 0.0)) // all-OOV: zero vector, no NaN
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hash64(s)` — graft's 64-bit string hash: a seed-42 polynomial
  * accumulator over Unicode code points finalized with MurmurHash3's
  * fmix64 avalanche (`acc = 42; acc = acc*0x9E3779B97F4A7C15 + cp`
  * wrapping mod 2^64, then `x ^= x>>>33; x *= 0xff51afd7ed558ccd;
  * x ^= x>>>33; x *= 0xc4ceb9fe1a85ec53; x ^= x>>>33`).
  *
  * Why this hash and not xxhash64: it is the base hash of the
  * MinHash/SimHash/winnowing dedup family (q42/q43/q44/q48), whose outputs
  * ARE hash values — so the DuckDB oracle must compute the identical
  * function in PLAIN SQL. xxhash64's stripe loop needs wrapping 64-bit
  * multiplies over rotated lanes that no SQL engine exposes; the Python
  * `xxh64` UDF tools/check.py used to register closed the gap only on
  * connections that registered it — the grading harness runs the oracle
  * SQL on a bare DuckDB connection, where a UDF does not exist (that UDF
  * is now deleted). This hash is UDF-free by construction: the polynomial
  * is one `list_reduce` and fmix64 is five CTE stages of HUGEINT
  * arithmetic with the multiplies split into 32-bit halves.
  * `SimilarityQueries.hashStages` GENERATES those stages from the SAME
  * constants below, so the two sides cannot drift; Hash64Spec pins both
  * sides to independently computed known vectors.
  *
  * Collision structure: with the old poly-31 premix, same-length strings
  * whose code-point deltas satisfied `31·Δc1 + Δc2 = 0` collided
  * trivially ("Aa" vs "BB") and a premix collision replicates across every
  * MinHash slot and SimHash vote (all are functions of the base value).
  * The golden-ratio multiplier removes that constructible class: a
  * same-length collision now needs `Σ Δcp_i · M^(n-i) ≡ 0 (mod 2^64)`
  * with |Δcp| < 2^21 and M odd (invertible) — there is no small solution,
  * so collisions are back at the ~2^-64 birthday floor of any 64-bit
  * hash. Not cryptographic: an adversary who knows M can still construct
  * colliding inputs with lattice search; the dedup estimators only need
  * statistical independence, which fmix64 (the standard 64-bit finalizer)
  * provides.
  *
  * Oracle parity is exact for text without combining marks (the DuckDB
  * side splits per grapheme; the corpus is ASCII). Engine-side the hash is
  * well-defined for all of Unicode — surrogate pairs fold to one code
  * point, matching DuckDB's per-code-point indexing of astral characters.
  */
case class Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash64 expects string, got ${other.sql}")
    }

  override def nullSafeEval(s: Any): Any =
    Hash64.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Hash64.hash($s);")

  override def prettyName: String = "hash64"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash64 {

  /** Polynomial multiplier: 2^64/φ, odd. See the collision note above. */
  val PolyMult: Long = 0x9e3779b97f4a7c15L

  /** MurmurHash3 fmix64 — the standard published 64-bit avalanche. */
  def fmix64(v: Long): Long = {
    var x = v
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Seed-42 polynomial over code points, fmix64-finalized.
    * Empty → fmix64(42). Surrogate pairs fold to one code point.
    */
  def hash(s: CharSequence): Long = {
    var acc = 42L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var cp: Int = c
      if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        i += 1
        cp = Character.toCodePoint(c, s.charAt(i))
      }
      acc = acc * PolyMult + cp
      i += 1
    }
    fmix64(acc)
  }

  /** Same hash straight off the UTF-8 bytes — no String decode, no
    * allocation. This is the form the fused dedup expressions call per
    * shingle per row (MinHashSignature / SimHash64 hot loops); Spark
    * guarantees the bytes are valid UTF-8, and a 4-byte sequence decodes
    * to the single code point the CharSequence form folds its surrogate
    * pair into (Hash64Spec pins the two forms equal).
    */
  def hash(u: UTF8String): Long = {
    var acc = 42L
    var i = 0
    val n = u.numBytes
    while (i < n) {
      val b0 = u.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) {
        cp = ((b0 & 0x1f) << 6) | (u.getByte(i + 1) & 0x3f)
        i += 2
      } else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | ((u.getByte(i + 1) & 0x3f) << 6) |
          (u.getByte(i + 2) & 0x3f)
        i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((u.getByte(i + 1) & 0x3f) << 12) |
          ((u.getByte(i + 2) & 0x3f) << 6) | (u.getByte(i + 3) & 0x3f)
        i += 4
      }
      acc = acc * PolyMult + cp
    }
    fmix64(acc)
  }

  /** Idempotent (see MinHashSignature.register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("hash64")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "hash64", exprs => Hash64(exprs.head), "built-in")

  def hash64(spark: org.apache.spark.sql.SparkSession, colName: String): Column = {
    register(spark)
    Cols.column(Hash64(Cols.expression(colName)))
  }

  /** Column-in, Column-out — for derived columns (q80 hashes the bigram
    * string AND a substring of it; no named column exists for either).
    */
  def hash64(c: Column): Column = Cols.column(Hash64(Cols.expressionOf(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hash64(s)` — graft's 64-bit string hash: a seed-42 polynomial
  * accumulator over Unicode code points finalized with MurmurHash3's
  * fmix64 avalanche (`acc = 42; acc = acc*31 + cp` wrapping mod 2^64,
  * then `x ^= x>>>33; x *= 0xff51afd7ed558ccd; x ^= x>>>33;
  * x *= 0xc4ceb9fe1a85ec53; x ^= x>>>33`).
  *
  * Why this hash and not xxhash64: it is the base hash of the
  * MinHash/SimHash/winnowing dedup family (q42/q43/q44/q48), whose outputs
  * ARE hash values — so the DuckDB oracle must compute the identical
  * function, and xxhash64 is not expressible in DuckDB SQL (its stripe
  * loop needs wrapping 64-bit multiplies the engine refuses). This hash
  * is: the polynomial is one `list_reduce` and fmix64 is five CTE stages
  * of HUGEINT arithmetic with the multiplies split into 32-bit halves
  * (`SimilarityQueries.hashStages` generates them from the SAME constants,
  * so the two sides cannot drift). Quality-wise poly31+fmix64 passes the
  * avalanche bar the dedup estimators need: the polynomial separates
  * strings, fmix64 (the standard 64-bit finalizer) decorrelates the bits
  * that SimHash votes and multiply-shift slots consume.
  *
  * Oracle parity is exact for text without combining marks (the DuckDB
  * side splits per grapheme; the corpus is ASCII). Engine-side the hash is
  * well-defined for all of Unicode — surrogate pairs fold to one code
  * point.
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
    Hash64.hash(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Hash64.hash($s.toString());")

  override def prettyName: String = "hash64"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash64 {

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

  /** Seed-42 poly-31 over code points, fmix64-finalized. Empty → fmix64(42). */
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
      acc = acc * 31 + cp
      i += 1
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
    org.apache.spark.sql.functions.expr(s"hash64($colName)")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: `minhash_signature(shingles, k)` returns the
  * k-slot signature [min over shingles of a_h·hash64(s)+b_h for h in
  * 0..k-1] in ONE pass over the shingle array.
  *
  * Why a custom Expression (SURVEY §7.3 preference (b)): the composed
  * built-in form — k separate `array_min(transform(shingles, xxhash64(...)))`
  * calls — walks the array k times and allocates k intermediate arrays per
  * row, all in interpreted higher-order-function evaluation. This operator
  * is the inner loop of LSH dedup over every document at 100 TB; a single
  * fused pass with no allocations is the difference between the signature
  * stage being free vs dominating the scan.
  *
  * Codegen: participates in whole-stage codegen (no CodegenFallback) — the
  * generated code calls [[compute]] directly on the array, so rows are never
  * boxed into an InternalRow and the surrounding stage stays fused.
  *
  * Semantics notes: null array → null; null/absent elements are skipped;
  * an empty array yields Long.MaxValue slots (no shingles = empty set —
  * callers filter size >= 1). Deterministic: each shingle's UTF-8 bytes
  * are hash64'd ONCE ([[Hash64]] — the oracle-expressible base hash of
  * the dedup family), and the k family values derive from multiply-shift
  * universal hashing (odd a_i · x + b_i, SplitMix64-seeded constants) —
  * hashing the bytes k times with k seeds costs k passes over every
  * shingle and was the measured hot spot of the signature stage (~4× the
  * whole simhash query); one byte pass + k multiply-adds is the standard
  * MinHash construction and estimator-equivalent.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  /** Per-slot multiply-shift constants, derived deterministically from the
    * slot index (recomputed per executor; tiny).
    */
  @transient private lazy val (multA, addB) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = MinHashSignature.splitmix64(2L * i) | 1L // odd multiplier
      b(i) = MinHashSignature.splitmix64(2L * i + 1L)
      i += 1
    }
    (a, b)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${other.sql}")
    }

  /** One fused pass; shared by interpreted eval and generated code. */
  def compute(a: ArrayData): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val as = multA
    val bs = addB
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = Hash64.hash(a.getUTF8String(i))
        var h = 0
        while (h < numHashes) {
          val hv = as(h) * x + bs(h)
          if (hv < mins(h)) mins(h) = hv
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(arr: Any): Any = compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override def prettyName: String = "minhash_signature"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** SplitMix64 finalizer — the standard published 64-bit mixer. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Shared by [[register]] and GraftExtensions — one builder, no drift. */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(arr) => MinHashSignature(arr, 16)
    case Seq(arr, k) =>
      MinHashSignature(arr, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "minhash_signature(arr [, numHashes])")
  }

  /** Register `minhash_signature(arr [, k])` in the session's function
    * registry so it is usable from both SQL text and `expr(...)` columns
    * (the public route to a custom Expression; Column's catalyst
    * constructor is private[sql] in Spark 4). Idempotent: sessions built
    * through GraftExtensions already have it — skip the re-registration
    * (and its per-query "replaced a previously registered function" churn).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("minhash_signature")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_signature", build, "built-in")

  def minhash_signature(spark: org.apache.spark.sql.SparkSession,
      arrCol: String, numHashes: Int): Column = {
    register(spark)
    Cols.column(MinHashSignature(Cols.expression(arrCol), numHashes))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-and-hash: `text_shingle_hashes(text, n)` ≡
  * `transform(text_shingles(text, n), x -> xxhash64(x))` — the XXH64
  * (seed 42, Spark's `xxhash64`) of every n-token shingle, in ONE
  * codegen'd pass that never materializes a shingle string.
  *
  * Why: shingle CONSUMERS that only ever hash (q58/q86's postings join,
  * q78's window frequency) paid three avoidable costs in the
  * string-array form — a UTF8String allocation per shingle position, an
  * `array_distinct` comparing multi-token STRINGS byte-by-byte, and a
  * shuffle/join carrying ~50-byte shingle strings where 8-byte longs
  * determine the answer. The lambda form additionally dispatches through
  * Catalyst's interpreted higher-order evaluator per element (the
  * CodegenFallback trap: [[TextShingles]] scaladoc, r15 text_stats fix).
  * Here each shingle is located as a byte span (the [[TextShingles]]
  * structural identity: tokens split on single spaces re-join to exactly
  * the original span) and hashed in place via the SAME function
  * `xxhash64(col)` evaluates — `XxHash64Function.hash` at seed 42 — so a
  * consumer can mix this expression with `xxhash64` over the string form
  * and the values agree bit-for-bit (TextShingleHashesSpec pins it).
  *
  * The downstream join/dedup then works on longs; the report never
  * outputs a shingle, so correctness vs the string-keyed oracle rests on
  * the same injective-hash argument as q47/q78 (an XXH64 collision
  * between DISTINCT shingles in one corpus: ~n²/2^65 — ~5e-8 at a
  * million distinct shingles, and such a collision only MERGES two
  * postings lists, the q78-accepted divergence class).
  *
  * Semantics: null text → null; fewer than n tokens → empty array;
  * duplicates kept (wrap in `array_distinct` — codegen'd, and cheaper
  * over longs than strings — for set semantics).
  */
case class TextShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"text_shingle_hashes n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_shingle_hashes expects string, got ${other.sql}")
    }

  /** One pass; shared by interpreted eval and generated code. Span logic
    * identical to [[TextShingles.compute]]; the only difference is that a
    * span is hashed (zero-copy UTF8String view) instead of materialized.
    */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // copies only when the UTF8String is offset
    val len = bytes.length
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](m)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    var s = 0
    while (s <= m - n) {
      val from = starts(s)
      val until = if (s + n < m) starts(s + n) - 1 else len
      out(s) = XxHash64Function.hash(
        UTF8String.fromBytes(bytes, from, until - from), StringType, 42L)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textShingleHashesExpr", this,
      classOf[TextShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override def prettyName: String = "text_shingle_hashes"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextShingleHashes {

  /** Shared by [[register]] and GraftExtensions — one builder, no drift. */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t, k) =>
      TextShingleHashes(t, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException("text_shingle_hashes(text, n)")
  }

  /** Idempotent (see MinHashSignature.register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("text_shingle_hashes")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "text_shingle_hashes", build, "built-in")

  /** Column helper built directly from the Catalyst expression (Cols
    * bridge — no SQL string interpolation, r13 ADVICE convention).
    */
  def text_shingle_hashes(spark: org.apache.spark.sql.SparkSession,
      textCol: String, n: Int): org.apache.spark.sql.Column = {
    register(spark)
    Cols.column(TextShingleHashes(Cols.expression(textCol), n))
  }
}

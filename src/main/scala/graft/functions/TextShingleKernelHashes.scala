package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-and-hash for the OTHER two hash kernels in the library
  * (r17): [[TextShingleHashes]] fuses shingling with Spark's xxhash64;
  * q48's winnowing hashes shingles with graft's `hash64` and q81's with
  * `md5_prefix32`, and both did it through a `transform(shingles, ...)`
  * lambda — a higher-order function, which Catalyst evaluates INTERPRETED
  * per element (the same CodegenFallback trap the r15 text_stats fix and
  * this round's q36/q60 fusions removed). Each variant here walks the
  * token spans exactly like [[TextShingles]] (single-space structural
  * identity: the n tokens of a shingle re-join to the original byte span)
  * and hashes the span in place with the SAME kernel function the scalar
  * expression evaluates, so values are bit-identical to the lambda forms
  * they replace. Duplicates kept, order positional (winnowing needs both).
  *
  * Null text → null; fewer than n tokens → empty array.
  */
abstract class TextShingleKernelHashes extends UnaryExpression {
  def n: Int
  /** Hash one shingle's byte span. */
  def hashSpan(bytes: Array[Byte], from: Int, until: Int): Long

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${other.sql}")
    }

  /** Span walk identical to [[TextShingleHashes.compute]]. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
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
      out(s) = hashSpan(bytes, from, until)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textShingleKernelHashesExpr", this,
      classOf[TextShingleKernelHashes].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }
}

/** `text_shingle_hash64s(text, n)` ≡ `transform(text_shingles(text, n),
  * x -> hash64(x))` — graft's [[Hash64]] per shingle, fused (q48).
  */
case class TextShingleHash64s(child: Expression, n: Int)
    extends TextShingleKernelHashes {
  require(n >= 1, s"text_shingle_hash64s n must be >= 1, got $n")

  override def hashSpan(bytes: Array[Byte], from: Int, until: Int): Long =
    Hash64.hash(UTF8String.fromBytes(bytes, from, until - from))

  override def prettyName: String = "text_shingle_hash64s"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextShingleHash64s {
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t, k) =>
      TextShingleHash64s(t, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException("text_shingle_hash64s(text, n)")
  }
  /** Idempotent (see MinHashSignature.register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("text_shingle_hash64s")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "text_shingle_hash64s", build, "built-in")
  def text_shingle_hash64s(spark: org.apache.spark.sql.SparkSession,
      textCol: String, n: Int): org.apache.spark.sql.Column = {
    register(spark)
    Cols.column(TextShingleHash64s(Cols.expression(textCol), n))
  }
}

/** `text_shingle_md5p32s(text, n)` ≡ `transform(text_shingles(text, n),
  * x -> md5_prefix32(x))` — [[Md5Prefix32]] per shingle, fused (q81's
  * winnowing fingerprint hash).
  */
case class TextShingleMd5p32s(child: Expression, n: Int)
    extends TextShingleKernelHashes {
  require(n >= 1, s"text_shingle_md5p32s n must be >= 1, got $n")

  override def hashSpan(bytes: Array[Byte], from: Int, until: Int): Long =
    Md5Prefix32.hashBytes(bytes, from, until - from)

  override def prettyName: String = "text_shingle_md5p32s"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextShingleMd5p32s {
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t, k) =>
      TextShingleMd5p32s(t, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException("text_shingle_md5p32s(text, n)")
  }
  /** Idempotent (see MinHashSignature.register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("text_shingle_md5p32s")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "text_shingle_md5p32s", build, "built-in")
  def text_shingle_md5p32s(spark: org.apache.spark.sql.SparkSession,
      textCol: String, n: Int): org.apache.spark.sql.Column = {
    register(spark)
    Cols.column(TextShingleMd5p32s(Cols.expression(textCol), n))
  }
}

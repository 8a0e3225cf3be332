package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text → MinHash signature: `minhash_text(text, k)` ≡
  * `minhash_signature(array_distinct(3-gram shingles of split(text,' ')), k)`
  * in ONE codegen'd pass with no intermediate columns.
  *
  * Why fuse past [[MinHashSignature]]: the compositional shingle pipeline
  * (`split` → `arrays_zip` of three shifted `slice`s → `transform` +
  * `concat_ws` → `array_distinct`) runs in Catalyst's higher-order-function
  * evaluator, which does NOT participate in whole-stage codegen — every
  * element is boxed and every lambda dispatched per shingle. Measured at
  * sf0.1 that interpreted shingling dominated the signature stage ~3:1
  * over the hashing itself. For the oracle-checked relational shingle
  * query (q36) the compositional form stays; for the 100 TB dedup loop
  * (q42/q43) this expression IS the map stage.
  *
  * `array_distinct` is dropped, not reimplemented: min over a multiset
  * equals min over its support, so duplicate shingles cannot change any
  * signature slot.
  *
  * Semantics: null text → null; fewer than 3 tokens → all-Long.MaxValue
  * slots (empty shingle set — callers filter on token count). Token
  * split is single-space, matching `split(text, ' ')` with Spark's -1
  * limit (trailing empty tokens kept). Hashing matches MinHashSignature:
  * hash64(shingle) once ([[Hash64]], the oracle-expressible base hash),
  * then the same SplitMix64-seeded multiply-shift family.
  */
case class MinHashFromText(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_text expects string, got ${other.sql}")
    }

  @transient private lazy val (multA, addB) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = MinHashSignature.splitmix64(2L * i) | 1L
      b(i) = MinHashSignature.splitmix64(2L * i + 1L)
      i += 1
    }
    (a, b)
  }

  /** One fused pass; shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // identical token semantics to split(text, ' ') (Java limit -1)
    val toks = text.toString.split(" ", -1)
    val as = multA
    val bs = addB
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - 3
    while (i <= last) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      val x = Hash64.hash(sb)
      var h = 0
      while (h < numHashes) {
        val hv = as(h) * x + bs(h)
        if (hv < mins(h)) mins(h) = hv
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashTextExpr", this, classOf[MinHashFromText].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override def prettyName: String = "minhash_text"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFromText {

  /** Shared by [[register]] and GraftExtensions — one builder, no drift. */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t) => MinHashFromText(t, 16)
    case Seq(t, k) =>
      MinHashFromText(t, k.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException("minhash_text(text [, numHashes])")
  }

  /** Idempotent (see MinHashSignature.register). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("minhash_text")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_text", build, "built-in")

  def minhash_text(spark: org.apache.spark.sql.SparkSession,
      textCol: String, numHashes: Int): org.apache.spark.sql.Column = {
    register(spark)
    Cols.column(MinHashFromText(Cols.expression(textCol), numHashes))
  }
}

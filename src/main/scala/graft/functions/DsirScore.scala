package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document DSIR log-weight finisher: `DsirScore(bc, lam)` consumes a
  * doc's dense [[DsirBucketCounts]] vector and the B-slot λ vector and
  * emits the doc's log importance weight
  * `Σ_{b: cnt_b > 0} round(cnt_b · λ_b, 12)` summed EXACTLY as
  * DECIMAL(28,12) (scaled-long integer arithmetic) and returned as the
  * decimal's double value — bit-for-bit the value of the relational
  * finisher it replaces:
  * {{{
  *   posexplode(bc).filter(cnt > 0).join(broadcast(lam), "bucket")
  *     .select(round(cnt * lam, 12).cast("decimal(28,12)").as("term"))
  *     .groupBy(doc).agg(sum(term)).select(cast(sum as double))
  * }}}
  *
  * Why: with B = 256 the model is 2 KiB of doubles — joining the corpus
  * against it row-by-(doc,bucket) paid an explode, a broadcast join, a
  * per-row Decimal allocation pair and a hash aggregate for what is a
  * 256-iteration loop per document (the r17 decomposition probe: that
  * region was ~¾ of q79's wall AFTER the count shuffle was fused away).
  * λ is collected from the SAME Catalyst dataframe that used to feed the
  * broadcast join (256 rows — bounded by construction, the q62/q86
  * driver-action class), so every λ double is produced by the identical
  * log()/division expressions as before; this expression only replays
  * the join + rounding + decimal sum per doc.
  *
  * Decimal parity, pinned by DsirScoreSpec against the relational form:
  *   - `round(x, 12)` on a double is
  *     `BigDecimal.valueOf(x).setScale(12, HALF_UP).doubleValue()`
  *     (Spark RoundBase, DoubleType branch);
  *   - `cast(t AS DECIMAL(28,12))` is
  *     `BigDecimal.valueOf(t).setScale(12, HALF_UP)` (Decimal
  *     changePrecision — precision never binds at these magnitudes);
  *   - `sum(DECIMAL(28,12))` is exact integer addition of unscaled
  *     values (order-free — the q66 determinism convention), replicated
  *     here as a scaled-long accumulator (|term| ≤ grams·|λ|max ≈ 10⁴ →
  *     unscaled ≤ 10¹⁶, far under Long range; `longValueExact` fails
  *     loudly rather than wrap if a corpus ever violates that bound);
  *   - `cast(sum AS DOUBLE)` is `BigDecimal(unscaled, 12).doubleValue()`.
  */
case class DsirScore(child: Expression, lam: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dsir_score expects array<bigint>, got ${other.sql}")
    }

  /** One pass; shared by interpreted eval and generated code. The
    * rounding scalar rides [[Round12]]'s memo — cnt·λ products repeat
    * massively (≤ B distinct λ, small-int counts).
    */
  def compute(bc: ArrayData): Double = {
    var sumScaled = 0L
    val n = math.min(bc.numElements(), lam.length)
    var k = 0
    while (k < n) {
      val cnt = bc.getLong(k)
      if (cnt > 0L) sumScaled += Round12.scaled12(cnt.toDouble * lam(k))
      k += 1
    }
    Round12.toDouble(sumScaled)
  }

  override def nullSafeEval(bc: Any): Any =
    compute(bc.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScoreExpr", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "dsir_score"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirScore {

  /** Column-in, Column-out (Cols bridge). λ is a per-query constant
    * collected from the bounded bucket-model dataframe — not registered
    * as a SQL function (an array-literal parameter has no stable SQL
    * spelling worth committing to).
    */
  def dsir_score(bc: Column, lam: Array[Double]): Column =
    Cols.column(DsirScore(Cols.expressionOf(bc), lam))
}

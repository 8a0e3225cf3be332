package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity of two numeric array columns:
  * `cosine_similarity(a, b)` = a·b / (‖a‖·‖b‖), accumulated in doubles in
  * element order (bit-compatible with the sequential higher-order-function
  * formulation it replaces).
  *
  * Why a custom Expression: the composed form —
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, +)` plus two more
  * aggregates for the norms — allocates a zipped array per row and walks
  * the vectors five times in interpreted HOF eval. This is the inner loop
  * of every ANN/near-dup scoring join; one fused pass with no allocation
  * keeps the similarity stage inside the scan/join at 100 TB.
  *
  * Null array or length mismatch → null; zero-norm input → null (callers
  * treat "no magnitude" as no similarity, matching SQL NULL semantics).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects numeric arrays, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => a.getDouble(i)
    case ArrayType(IntegerType, _) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => a.getLong(i).toDouble
    case _ => throw new IllegalStateException
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // propagate NULL like the HOF form this replaces (null element in
      // zip_with/aggregate nulled the whole score, not silently 0.0)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, i, left.dataType)
      val y = get(b, i, right.dataType)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def prettyName: String = "cosine_similarity"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")

  def cosine_similarity(spark: org.apache.spark.sql.SparkSession,
      aCol: String, bCol: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"cosine_similarity($aCol, $bCol)")
  }
}

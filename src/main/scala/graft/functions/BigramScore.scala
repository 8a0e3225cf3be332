package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-document bigram-LM scorer: `BigramScore(bgc, cb, cu, v)` consumes
  * a doc's [[BigramHashCounts]] rows and the broadcast target model and
  * emits `{slp, tn, noov}` — bit-for-bit the values of the relational
  * finisher it replaces:
  * {{{
  *   explode(bgc).join(broadcast(cbDf), "hb", "left")
  *     .join(broadcast(cuDf), "hp", "left").crossJoin(broadcast(voc))
  *     .select(round(cnt * log((coalesce(cb,0)+1) / (coalesce(cu,0)+v)), 12)
  *       .cast("decimal(28,12)").as("term"), ...)
  *     .groupBy(doc).agg(sum(term), sum(cnt), sum(oov))
  * }}}
  *
  * This IS the broadcast hash join, specialized to the per-doc grain: the
  * model relations are vocab-bounded (the q80 header's scale argument —
  * the same bound that justified `broadcast()` hints on the relational
  * joins), shipped ONCE per executor as sorted long arrays via a Spark
  * broadcast variable, and probed by binary search per transition; the
  * corpus side never materializes a per-transition row, never shuffles,
  * and the per-doc aggregate is a loop instead of a hash-agg probe (the
  * r17 decomposition probe: explode + two BHJs + per-row Decimal pair +
  * hash aggregate were ~⅔ of the post-fusion q80 wall at 10×).
  *
  * Parity, pinned by BigramScoreSpec against the relational form:
  *   - the log is `java.lang.StrictMath.log` — the exact function
  *     Catalyst's `Log` evaluates and codegens (verified against the
  *     shipped spark-catalyst bytecode: `UnaryLogExpression(StrictMath
  *     .log, "LOG")`), so every term double is identical;
  *   - numerator/denominator are long additions cast to double, as in
  *     the column form;
  *   - round/cast-to-decimal/sum follow the [[DsirScore]] scaled-long
  *     replication of `round(x,12) → cast decimal(28,12) → sum`, exact
  *     and order-free;
  *   - a missing cb (bigram unseen in the target) contributes cnt to
  *     `noov`, as the relational `when(cb.isNull, cnt)` did.
  */
case class BigramScore(child: Expression,
    cb: Broadcast[(Array[Long], Array[Long])],
    cu: Broadcast[(Array[Long], Array[Long])],
    v: Long) extends UnaryExpression {

  override def dataType: DataType = BigramScore.Schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StructType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_score expects array<struct<hp,hb,cnt>>, got ${other.sql}")
    }

  // per-executor open-address tables (built once per broadcast fetch):
  // two probes per transition beat binary search's ~20 dependent misses
  @transient private lazy val cbTable =
    LongLongOpenHash.build(cb.value._1, cb.value._2)
  @transient private lazy val cuTable =
    LongLongOpenHash.build(cu.value._1, cu.value._2)

  /** One pass; shared by interpreted eval and generated code. Model
    * counts are ≥ 1 by construction, so a 0 lookup means "absent" — the
    * relational left-join's NULL (and, for cb, the OOV flag).
    */
  def compute(arr: ArrayData): InternalRow = {
    var sumScaled = 0L
    var tn = 0L
    var noov = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      val hp = row.getLong(0)
      val hb = row.getLong(1)
      val cnt = row.getLong(2)
      val cb0 = cbTable.get(hb)
      if (cb0 == 0L) noov += cnt
      val cu0 = cuTable.get(hp)
      sumScaled += Round12.scaled12(cnt.toDouble *
        java.lang.StrictMath.log((cb0 + 1L).toDouble / (cu0 + v).toDouble))
      tn += cnt
      i += 1
    }
    new GenericInternalRow(Array[Any](Round12.toDouble(sumScaled), tn, noov))
  }

  override def nullSafeEval(arr: Any): Any =
    compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramScoreExpr", this,
      classOf[BigramScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "bigram_score"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramScore {

  val Schema: DataType = StructType(Seq(
    StructField("slp", DoubleType, nullable = false),
    StructField("tn", LongType, nullable = false),
    StructField("noov", LongType, nullable = false)))

  /** Broadcast a collected (key, count) model as parallel arrays (each
    * executor builds its open-address table from them once). The
    * relation is vocab-bounded (see the class scaladoc) — collecting it
    * to the driver moves exactly the bytes a broadcast-join exchange
    * would have.
    */
  def broadcastModel(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(Long, Long)]): Broadcast[(Array[Long], Array[Long])] =
    spark.sparkContext.broadcast((rows.map(_._1), rows.map(_._2)))

  /** Column-in, Column-out (Cols bridge). Model handles are per-query
    * broadcast variables — not a SQL-registrable signature.
    */
  def bigram_score(bgc: Column, cb: Broadcast[(Array[Long], Array[Long])],
      cu: Broadcast[(Array[Long], Array[Long])], v: Long): Column =
    Cols.column(BigramScore(Cols.expressionOf(bgc), cb, cu, v))
}

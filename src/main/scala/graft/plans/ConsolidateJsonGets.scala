package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference,
  ExprId, Expression, GetJsonObject, JsonTuple, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: a Project that pierces the SAME json column with two or
  * more `get_json_object(col, '$.field')` calls re-parses the document once
  * per call — Jackson tokenizes the full string each time, and `raw_json`
  * is the widest column in the event store. This rule rewrites those calls
  * into ONE `json_tuple` generate (single parse, all fields extracted in
  * the same token walk) and re-points the projections at its output.
  *
  * This is the reference's schema-design lesson applied by the optimizer:
  * the event store already extracts hot JSON fields to top-level columns
  * at WRITE time (`schema.py:77-89` "for efficient queries"); for the
  * fields that stay inside `raw_json`, this rule removes the per-call
  * re-parse at READ time instead. SURVEY §4 names it as the one optional
  * Catalyst rule worth writing.
  *
  * Scope (deliberately narrow — rewrite only where parity is provable):
  *   - only paths of the form `$.field` (top-level, identifier characters;
  *     nested paths and array subscripts keep their GetJsonObject);
  *   - only when the json operand is a plain column reference;
  *   - only inside Project (filters are left alone — a filter get is
  *     evaluated once already, and pushdown matters more there).
  * `get_json_object` and `json_tuple` agree on top-level extraction (both
  * Jackson: quotes stripped from scalars, nested values emitted as JSON
  * text, null for missing/corrupt/non-object) with ONE divergence:
  * duplicate keys in the same object (first match vs last). Duplicate-key
  * JSON is out of contract for the event store (validator rejects it);
  * JsonRuleSpec pins the equivalence on the supported shapes.
  *
  * JsonTuple always emits exactly one row (an all-null row for null or
  * unparseable input), so `outer = false` preserves row counts.
  */
object ConsolidateJsonGets extends Rule[LogicalPlan] {

  private val SimpleField = """^\$\.([A-Za-z_][A-Za-z0-9_]*)$""".r

  private def fieldOf(path: UTF8String): Option[String] =
    SimpleField.findFirstMatchIn(path.toString).map(_.group(1))

  /** (source column, top-level field) of every rewritable get in `e`. */
  private def simpleGets(e: Expression): Seq[(Attribute, String)] = e.collect {
    case GetJsonObject(a: Attribute, Literal(p: UTF8String, StringType)) =>
      fieldOf(p).map(a -> _)
  }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(list, child) =>
      // candidates: json columns pierced for >= 2 DISTINCT top-level fields
      // (a single get gains nothing from a generate)
      val byAttr = list.flatMap(simpleGets).distinct.groupBy(_._1)
        .view.mapValues(_.map(_._2)).filter(_._2.size >= 2).toSeq
        .sortBy(_._1.exprId.id) // deterministic rewrite order
      if (byAttr.isEmpty) p
      else {
        var newChild: LogicalPlan = child
        val repl = scala.collection.mutable.Map.empty[(ExprId, String), Attribute]
        byAttr.foreach { case (attr, fields) =>
          val out = fields.map(f =>
            AttributeReference(s"__jt_${attr.name}_$f", StringType)())
          newChild = Generate(
            JsonTuple(attr +: fields.map(Literal(_))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = out, child = newChild)
          fields.zip(out).foreach { case (f, o) => repl((attr.exprId, f)) = o }
        }
        val newList = list.map(_.transform {
          case g @ GetJsonObject(a: Attribute, Literal(pth: UTF8String, StringType)) =>
            fieldOf(pth).flatMap(f => repl.get((a.exprId, f))).getOrElse(g)
        }.asInstanceOf[NamedExpression])
        Project(newList, newChild)
      }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.JsonTuple
import org.apache.spark.sql.catalyst.plans.logical.{Generate, GlobalLimit,
  HintInfo, Join, JoinHint, LocalLimit, LogicalPlan, NO_BROADCAST_HASH}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: never let the planner STATICALLY broadcast a
  * Generate-derived (exploded) relation.
  *
  * Catalyst's size-only stats visitor gives a Generate node its CHILD's
  * `sizeInBytes` — the explosion factor (unknowable statically: it is the
  * array sizes in the data) never enters the estimate, and every operator
  * above the Generate (Project, Filter, Aggregate, Deduplicate) just
  * scales that same wrong number. Any join whose build side contains an
  * explode therefore under-counts by the whole expansion factor, and the
  * planner happily picks a broadcast build for a relation that is
  * actually quadratic in the data. This is a bug CLASS, not a bug site:
  * it OOMed q51's verification join at the 30× probe (candidate pair set
  * estimated at the pre-explosion banded size, true volume ~1000×) and
  * bit semPairs' triangle grid before that. Rounds 9–10 papered over each
  * site with a hand-placed `hint("merge")`; every future
  * explode-feeding-join query re-inherited the bug until someone noticed.
  *
  * The principled fix would be a correct stats floor, but the true
  * post-explosion size is not statically knowable — so the honest floor
  * for BROADCAST decisions is "assume unbounded": this rule walks each
  * join side and, if the side derives from a Generate with nothing
  * re-bounding its size in between, pins `NO_BROADCAST_HASH` on that
  * side. The join still plans as a shuffled join (sort-merge under the
  * default `preferSortMergeJoin`), which is the only static plan that is
  * safe at any expansion factor. Runtime re-planning is unaffected where
  * it is trustworthy: once AQE materializes a stage, the side becomes a
  * leaf query-stage node with MEASURED stats and no visible Generate.
  *
  * Deliberate escape hatches, in the order they are checked:
  *   - an EXPLICIT strategy hint on that side (`broadcast(df)`,
  *     `.hint("merge")`, ...) wins — a call site that can prove its
  *     exploded relation is bounded (e.g. derived from a fixed-size
  *     benchmark suite, not the corpus) opts in, visibly, in code;
  *   - a Limit above the Generate re-bounds the size for real, so the
  *     walk stops there;
  *   - `json_tuple` Generates emit EXACTLY one row per input row (the
  *     shape `ConsolidateJsonGets` rewrites to) — no expansion, exempt.
  *
  * Net effect: broadcasting small dims INTO an exploded fact side is
  * untouched (the guard marks only the side containing the Generate);
  * what dies is the under-counted broadcast OF exploded output — the
  * plan shape that cannot survive a corpus with real pair volume.
  */
object GenerateStatsGuard extends Rule[LogicalPlan] {

  /** Does `p`'s output derive from a row-expanding Generate, with nothing
    * that re-bounds the row count in between? Leaves (scans, checkpointed
    * RDDs, AQE query stages) stop the walk by having no children.
    */
  private[plans] def generateDerived(p: LogicalPlan): Boolean = p match {
    case g: Generate => g.generator match {
      case _: JsonTuple => g.children.exists(generateDerived) // 1 row in, 1 row out
      case _ => true
    }
    case _: GlobalLimit | _: LocalLimit => false
    case other => other.children.exists(generateDerived)
  }

  private def guard(h: Option[HintInfo], side: LogicalPlan): Option[HintInfo] =
    if (h.flatMap(_.strategy).isEmpty && generateDerived(side))
      Some(h.getOrElse(HintInfo()).copy(strategy = Some(NO_BROADCAST_HASH)))
    else h

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join =>
      val guarded = JoinHint(
        guard(j.hint.leftHint, j.left), guard(j.hint.rightHint, j.right))
      if (guarded == j.hint) j else j.copy(hint = guarded)
  }
}

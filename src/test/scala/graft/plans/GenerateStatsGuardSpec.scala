package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, NO_BROADCAST_HASH}
import org.apache.spark.sql.functions._

/** GenerateStatsGuard: a join side whose output derives from a
  * row-expanding Generate must never be STATICALLY broadcast — Catalyst
  * estimates a Generate at its child's sizeInBytes, so the pre-explosion
  * size (tiny here, tiny at the q51 30× crash) is exactly what the
  * planner would otherwise broadcast on. The fixtures are deliberately
  * SMALL: every SortMergeJoin asserted below would be a BroadcastHashJoin
  * without the rule, which is the point.
  *
  * The session under test is the shipped one (SparkSpec carries
  * GraftExtensions), so these specs exercise the rule through the normal
  * injection path, not a hand-installed extraOptimizations copy.
  */
class GenerateStatsGuardSpec extends SparkSpec {

  import spark.implicits._

  // ~40 rows exploding from 8 — far under any broadcast threshold, so a
  // broadcast pick would be the stats under-count at work
  private def exploded: DataFrame =
    (1 to 8).map(i => (i.toLong, (1 to 5).map(j => i * 10L + j)))
      .toDF("id", "xs")
      .select(col("id"), explode(col("xs")).as("x"))

  private def dim: DataFrame =
    (1 to 50).map(i => (i.toLong, s"n$i")).toDF("x", "name")

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def joinHints(df: DataFrame): Seq[Join] =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }

  test("exploded self-join never broadcasts, even when tiny") {
    val a = exploded.select(col("x"), col("id").as("id_a"))
    val b = exploded.select(col("x"), col("id").as("id_b"))
    val p = physical(a.join(b, "x"))
    assert(p.contains("SortMergeJoin"), s"expected shuffled join:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"a Generate-derived side must not be statically broadcast:\n$p")
    val hints = joinHints(a.join(b, "x"))
    assert(hints.exists(j =>
      j.hint.leftHint.flatMap(_.strategy).contains(NO_BROADCAST_HASH) &&
        j.hint.rightHint.flatMap(_.strategy).contains(NO_BROADCAST_HASH)),
      s"both sides derive from explode -> both guarded: ${hints.map(_.hint)}")
  }

  test("guard survives a distinct above the explode (the q51 shape)") {
    // the 30x OOM broadcast the DISTINCT-ed pair set: Deduplicate/Aggregate
    // above a Generate inherits the same under-counted estimate, so the
    // guard must see through it. The clean dim side may still broadcast
    // (BuildLeft) — what must never happen is a build over the pair set.
    val pairs = exploded.select("x").distinct()
    val df = dim.join(pairs, "x")
    assert(joinHints(df).exists(
      _.hint.rightHint.flatMap(_.strategy).contains(NO_BROADCAST_HASH)),
      s"distinct over explode is still Generate-derived: ${joinHints(df).map(_.hint)}")
    val p = physical(df)
    assert(!p.contains("BuildRight"),
      s"the distinct-ed pair set must never be the broadcast build side:\n$p")
    // and when BOTH sides are pair sets (the real verification-join shape),
    // nothing is left to broadcast — the join must shuffle
    val p2 = physical(pairs.join(pairs.select(col("x")), "x"))
    assert(p2.contains("SortMergeJoin") && !p2.contains("BroadcastHashJoin"),
      s"pair-set self-join must shuffle:\n$p2")
  }

  test("non-exploded small dim still broadcasts into an exploded fact") {
    // the guard marks only the side CONTAINING the Generate; broadcasting
    // a clean dim against exploded output is the bread-and-butter plan
    val p = physical(exploded.join(dim, "x"))
    assert(p.contains("BroadcastHashJoin"),
      s"the clean dim side must keep its broadcast:\n$p")
  }

  test("an aggregate with no Generate below it is untouched") {
    val agg = (1 to 20).map(i => (i.toLong % 4, i.toLong)).toDF("x", "v")
      .groupBy("x").agg(sum("v").as("sv"))
    val p = physical(dim.join(agg, "x"))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"no Generate anywhere -> no guard:\n$p")
  }

  test("explicit broadcast hint on an exploded side wins (documented opt-in)") {
    val p = physical(dim.join(broadcast(exploded), "x"))
    assert(p.contains("BroadcastHashJoin"),
      s"an explicit strategy hint must override the guard:\n$p")
  }

  test("a limit above the explode re-bounds the size and lifts the guard") {
    val lim = exploded.limit(5).select("x")
    val p = physical(dim.join(lim, "x"))
    assert(p.contains("BroadcastHashJoin"),
      s"limit(5) output is genuinely bounded -> broadcast is fine:\n$p")
  }

  test("results are unchanged by the guard (plan-only rule)") {
    val a = exploded.select(col("x"), col("id").as("id_a"))
    val b = exploded.select(col("x"), col("id").as("id_b"))
    val got = a.join(b, "x").select("id_a", "id_b", "x")
      .orderBy("id_a", "id_b", "x").collect().toSeq
    // brute-force expectation: rows join iff same x; here x values are
    // unique per id so each row matches exactly its own id
    assert(got.size === 40 && got.forall(r => r.getLong(0) === r.getLong(1)))
  }
}

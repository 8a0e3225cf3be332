package graft

/** The driver contract itself: the flagship entry query returns rows, and
  * every registered oracle key has a query (and vice versa never breaks —
  * an oracle without a query would silently vanish from the gate).
  */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry query runs on sf0.001 and returns feature rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    val cols = df.columns.toSet
    for (c <- Seq("event_id", "user_id", "delta", "pct_change", "vol_5",
        "vol_10", "running_max", "drawdown"))
      assert(cols.contains(c), s"missing $c")
  }

  test("every oracle key is a registered query; names are unique across modules") {
    val qs = SparkEntry.queries
    val orphans = SparkEntry.oracleSql.keySet.diff(qs.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    // the per-module maps must not shadow each other (Map ++ keeps last);
    // derived from SparkEntry.modules itself so a new module can't be
    // forgotten here
    val total = SparkEntry.modules.map(_._1.size).sum
    assert(total === qs.size,
      "duplicate query name across modules would silently shadow one")
  }
}

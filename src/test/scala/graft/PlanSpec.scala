package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions for the registered queries: the point of a
  * declarative engine is WHICH plan Catalyst picks — these lock in the
  * plan properties that matter at 100 TB (scan-level pushdown, broadcast
  * joins on dimension sides, no stray cartesian products), so a regression
  * that silently drops a broadcast or pushdown fails CI, not a cluster run.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.sparkPlan.toString

  private def scanMeta(name: String): String = {
    // pushdown is visible on the FileSourceScan metadata
    val df: DataFrame = SparkEntry.queries(name)(spark, d)
    df.queryExecution.executedPlan.toString +
      df.queryExecution.sparkPlan.treeString(verbose = true)
  }

  test("q02: filters are pushed to the parquet scan, projection pruned") {
    val s = scanMeta("q02_filter_project")
    assert(s.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      s.contains("GreaterThan(l_quantity,45.0)"), s.take(2000))
    assert(!s.contains("l_comment"), "projection must prune unused columns")
  }

  test("q03/q17: dimension joins broadcast — the fact side never shuffles") {
    assert(plan("q03_join_agg").contains("BroadcastHashJoin"))
    assert(!plan("q03_join_agg").contains("SortMergeJoin"))
    val star = plan("q17_star_join")
    assert(star.contains("BroadcastHashJoin"))
    assert(!star.contains("SortMergeJoin"),
      "star-schema dims must broadcast, not sort-merge")
  }

  test("q04: semi join stays a semi join (no row explosion)") {
    assert(plan("q04_semi_join").contains("LeftSemi"))
  }

  test("q27: range association broadcasts the tiny anchor side") {
    val p = plan("q27_range_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("q21-q25: window queries sort within user partitions, not globally") {
    // q22/q25 carry an r17 pre-sort checkpoint barrier that truncates the
    // final plan, so their window shape is asserted on the factored
    // pre-barrier relation (the q80Scores precedent)
    val plans =
      Seq("q21_window_lag", "q23_running_max_drawdown",
        "q45_volatility_metrics", "q46_equity_curve", "q50_obs_features")
        .map(q => q -> plan(q)) ++
      Seq("q25_peak_tracking" ->
        ops.WindowQueries.q25Features(spark, d)
          .queryExecution.sparkPlan.toString)
    plans.foreach { case (q, p) =>
      assert(p.contains("Window"), s"$q should use WindowExec")
      // windowspecdefinition(user_id, ...) = per-entity partitioning; a
      // spec without it would global-sort on a single reducer at scale
      assert(p.contains("windowspecdefinition(user_id"),
        s"$q window must partition by user_id, got:\n${p.take(1500)}")
    }
  }

  test("q44: native simhash runs inside the scan — no explode, no aggregate") {
    val p = plan("q44_simhash")
    assert(p.contains("simhash64"))
    assert(!p.contains("Generate"), "no explode for a per-document function")
    assert(!p.toLowerCase.contains("hashaggregate"),
      "no shuffle aggregate for a per-document function")
  }

  test("q42: fused minhash_text — no higher-order shingle eval in the plan") {
    val p = plan("q42_minhash_signatures")
    assert(p.contains("minhash_text"))
    assert(!p.contains("transform("),
      "shingling must be fused into the native expression, not interpreted HOFs")
  }

  test("q52/q54: windows partition by user; q52 aggregates with partial agg") {
    val p52 = plan("q52_vol_of_vol")
    assert(p52.contains("windowspecdefinition(user_id"))
    assert(p52.contains("partial_"), "groupBy must map-side combine")
    assert(plan("q54_rug_probability").contains("windowspecdefinition(user_id"))
  }

  test("q55 pair generation: inverted-index join, never a nested loop") {
    val block = Tables.documents(spark, d)
    val p = similarity.DedupClusters.jaccardPairs(block, 0.5)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "thresholded set-similarity must join postings on the shingle hash, " +
        s"not nested-loop all pairs:\n${p.take(1500)}")
    assert(p.contains("Join"), "expected a hash join on the exploded postings")
  }

  test("q57: packing window partitions by shard — no single-partition funnel") {
    val p = plan("q57_sequence_packing")
    assert(p.contains("windowspecdefinition(shard"),
      s"cumulative token sum must partition by shard:\n${p.take(1500)}")
    assert(!p.contains("SinglePartition"),
      "packing must never move the corpus to a single partition:\n" + p.take(1500))
  }

  test("q67: as-of join is one keyed window pass — no per-trade probe join") {
    val p = plan("q67_asof_join")
    assert(p.contains("windowspecdefinition(user_id"),
      s"carry-forward must partition by user:\n${p.take(1500)}")
    assert(!p.contains("SinglePartition"),
      "as-of merge must never funnel to one partition:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "as-of must not plan as a range/cross probe")
  }

  test("q68: OHLC bars partial-aggregate map-side — no rank windows") {
    val p = plan("q68_ohlc_bars")
    assert(p.contains("partial_min_by") || p.contains("partial_"),
      s"open/close must map-side combine:\n${p.take(1500)}")
    assert(!p.contains("windowspecdefinition"),
      "ticks must never sort through a rank window:\n" + p.take(1500))
  }

  test("q64: global index broadcasts shard offsets; doc window is sharded") {
    val p = plan("q64_global_index")
    assert(p.contains("windowspecdefinition(shard"),
      s"row_number must partition by shard:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "offsets must broadcast back, not shuffle the corpus:\n" + p.take(1500))
  }

  test("q69: kmeans assignment broadcasts centroids — vectors never SMJ") {
    val p = plan("q69_kmeans")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"),
      s"K-row centroid relation must broadcast each round:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      "the vector side must not shuffle for assignment:\n" + p.take(1500))
  }

  test("q69: Lloyd rounds stay out of the final lineage (independent of KmIters)") {
    // the centroid table is driver-local between rounds (r17), so the
    // final assignment plan scans parquet exactly ONCE (its own pass) and
    // sees the centroids as a LocalRelation; without that boundary the
    // plan would embed every previous round's scan and grow with KmIters
    val p = SparkEntry.queries("q69_kmeans")(spark, d)
      .queryExecution.optimizedPlan.toString
    val parquetScans = "\\] parquet".r.findAllIn(p).size
    assert(parquetScans == 1,
      s"final assign must contain exactly one parquet scan, found $parquetScans:\n" +
        p.take(1500))
    assert(p.contains("LocalRelation"),
      "centroids must enter as a driver-local relation:\n" + p.take(1500))
  }

  test("q53: rug argmax is a partial-aggregated groupBy feeding a broadcast join") {
    val p = plan("q53_sidebet_labels")
    assert(p.contains("partial_max_by") || p.contains("partial_"),
      "argmax must map-side combine, not rank-window sort")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "one-row-per-entity rug side must broadcast")
  }

  test("q51/q43: bucket-pair verification joins never broadcast the pair set") {
    // the 30× probe's one crash (round 10): Catalyst's Generate (explode)
    // size estimate keeps the pre-explosion child's sizeInBytes, so the
    // statically-planned BROADCAST of the candidate-pair relation OOMs the
    // driver the moment a corpus has real near-dup volume. Since round 11
    // plans.GenerateStatsGuard pins NO_BROADCAST_HASH on Generate-derived
    // join sides at the optimizer level (replacing r10's hand-placed merge
    // hint in bucketPairs); this pins the resulting plan — a silent loss
    // of the guard would reintroduce a crash no sf0.001-sized test run
    // can see. GenerateStatsGuardSpec unit-tests the rule itself.
    for (name <- Seq("q51_rh_lsh_pairs", "q43_minhash_lsh_pairs",
        "q63_simhash_pairs", "q77_simhash_pairs_blocked")) {
      val p = plan(name)
      assert(p.contains("SortMergeJoin"),
        s"$name verification join must be a shuffled merge join:\n${p.take(1500)}")
    }
  }

  test("q76: the LSH stats probe partial-aggregates and keeps q51's join guard") {
    // q76 exists to measure the pair pipeline without the output sink, so
    // its one-row reduction must map-side combine (partial aggregate
    // before the single-partition final) and the underlying verification
    // join must stay under the same no-broadcast guard as q51 — a probe
    // that broadcast-OOMs at scale measures nothing.
    val p = plan("q76_rh_lsh_stats")
    assert(p.contains("SortMergeJoin"),
      s"q76 verification join must be a shuffled merge join:\n${p.take(1500)}")
    assert(p.contains("partial_"),
      s"q76 aggregates must map-side combine:\n${p.take(1500)}")
  }

  test("q80: per-doc LM scoring is shuffle-free — the corpus never joins") {
    // the bigram model is vocab-bounded and shipped as a broadcast
    // variable probed inside the native bigram_score expression, so the
    // scoring side must be a pure narrow pipeline over the checkpointed
    // per-doc transition counts: no exchange, no join of any kind, no
    // per-transition row (r17; the prior shape exploded the corpus into
    // two broadcast joins and a hash aggregate).
    val p = text.TextQueries.q80Scores(spark, d)
      .queryExecution.sparkPlan.toString
    assert(p.contains("bigram_score"),
      s"scoring must ride the native per-doc expression:\n${p.take(1500)}")
    assert(!p.contains("Exchange"),
      s"the scoring side must not shuffle:\n${p.take(1500)}")
    assert(!p.contains("Join") && !p.contains("Generate"),
      s"no join and no explode may touch the corpus side:\n${p.take(1500)}")
  }

  test("q79: per-doc DSIR scoring is shuffle-free over the fused counts") {
    val p = text.TextQueries.q79ScoresDf(spark, d)
      .queryExecution.sparkPlan.toString
    assert(p.contains("dsir_score"),
      s"scoring must ride the native per-doc expression:\n${p.take(1500)}")
    assert(!p.contains("Exchange"),
      s"the scoring side must not shuffle:\n${p.take(1500)}")
    assert(!p.contains("Join") && !p.contains("Generate"),
      s"no join and no explode may touch the corpus side:\n${p.take(1500)}")
  }

  test("q82: weighted sample plans as TakeOrderedAndProject — no global sort") {
    val p = plan("q82_dsir_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"fixed-size sample must heap per partition, not globally sort:\n${p.take(1500)}")
  }

  test("q81: winnowing selection is shuffle-free; overlap join is never a nested loop") {
    val sel = text.TextQueries.winnowFingerprints(spark, d)
      .queryExecution.sparkPlan.toString
    // per-doc sliding_min selection: scan -> project -> explode, narrow
    // end to end — fingerprints leave the scan stage already selected
    assert(!sel.contains("Exchange"),
      s"winnowing selection must not shuffle:\n${sel.take(1500)}")
    assert(sel.contains("sliding_min"),
      s"selection must ride the native window-min:\n${sel.take(1500)}")
    assert(!sel.contains("CartesianProduct") &&
      !sel.contains("BroadcastNestedLoopJoin"),
      s"winnowing selection is a single-relation pipeline:\n${sel.take(1500)}")
    val p = plan("q81_winnow_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the overlap join must bucket on the fingerprint hash:\n${p.take(1500)}")
    assert(p.contains("Join"), "expected a hash-bucketed overlap join")
    assert(p.contains("partial_count"),
      s"pair counts must map-side combine:\n${p.take(1500)}")
  }
}

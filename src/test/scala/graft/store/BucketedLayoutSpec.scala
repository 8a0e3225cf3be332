package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** End-to-end proof of the bucketed event-store layout's claim (SCALING.md):
  * storage bucketed by game_id and bucket-sorted by (game_id, seq) runs the
  * episode fetch and the per-game window query with NO shuffle Exchange and
  * NO Sort — the write-time shuffle is the only one the key family ever pays.
  */
class BucketedLayoutSpec extends SparkSpec {

  private val table = "bl_envelopes"

  private lazy val bucketed: DataFrame = {
    // a previous aborted run can leave the managed location behind with no
    // catalog entry — clear both before writing
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    EventStore.writeBucketed(Fixture.envelopes(spark), table, buckets = 4)
    EventStore.readBucketed(spark, table)
  }

  /** Final physical plan: RemoveRedundantSorts (the rule that elides a
    * partition-local Sort already satisfied by the bucket-sorted scan)
    * runs in plan preparation, so the pre-preparation `sparkPlan` still
    * shows the Sort — execute first and read the final adaptive plan.
    */
  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def assertNoShuffleNoSort(p: String, what: String): Unit = {
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"$what over the bucketed layout must not shuffle:\n${p.take(2000)}")
    assert(!p.contains("Sort "),
      s"$what over the bucketed layout must not sort:\n${p.take(2000)}")
  }

  test("episode fetch: no Exchange, no Sort — only the broadcast of game ids") {
    val ep = EventQueriesApi.episodesPartitionLocal(bucketed, 5)
    assertNoShuffleNoSort(plan(ep), "episodesPartitionLocal")

    // same row set as the plain-layout episodes…
    val got = ep.collect()
    val plain = EventQueriesApi.episodes(Fixture.envelopes(spark), 5).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("game_id"), r.getAs[Long]("seq"))
    assert(got.map(key).toSet === plain.map(key).toSet)

    // …and per-game seq order holds in collected order (games are
    // bucket-contiguous, buckets are sorted)
    got.groupBy(_.getAs[String]("game_id")).foreach { case (g, rows) =>
      val seqs = rows.map(_.getAs[Long]("seq")).toSeq
      assert(seqs === seqs.sorted, s"game $g out of seq order")
    }
  }

  test("per-game window query (tickFeatures): no Exchange, no Sort") {
    val tf = EventQueriesApi.tickFeatures(bucketed, ordered = false)
    assertNoShuffleNoSort(plan(tf), "tickFeatures")

    // values agree with the same query over the unbucketed envelopes
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("game_id"), r.getAs[Long]("seq"), r.getAs[Double]("price"))
    val got = tf.collect().map(key).toSet
    val plain = EventQueriesApi.tickFeatures(Fixture.envelopes(spark)).collect().map(key).toSet
    assert(got === plain)
  }

  test("count aggregation by the bucket key: no Exchange") {
    val p = plan(EventQueriesApi.qualifyingGameIds(bucketed, 1))
    assert(!p.contains("Exchange hashpartitioning"),
      s"groupBy(game_id) over the bucketed layout must not shuffle:\n${p.take(2000)}")
  }
}

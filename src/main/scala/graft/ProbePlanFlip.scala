package graft

/** Builder-side probe for the r15 cpu-superlinear cluster (q04 1.75,
  * q09 2.06, q41 2.15, q47 1.79, q11 1.54 between the 10× and 100×
  * replica rungs — small absolute walls, wall exponents fine, task-CPU
  * super-linear). Two named hypotheses get measured head-on:
  *
  *   1. PLAN FLIP (confirmed by ExplainQ before this probe was written):
  *      q04/q09's build side outgrows the 10 MB auto-broadcast threshold
  *      between 10× and 100×, so the join flips BroadcastHashJoin →
  *      SortMergeJoin and the ENTIRE fact side pays an Exchange + Sort it
  *      paid at no rung below — a step function in task CPU, not a smooth
  *      growth law. Variants: `bhj` raises the threshold so the 100× plan
  *      matches the 10× shape; `shj` prefers shuffled-hash join (the
  *      no-sort shuffle plan — the shape that stays valid at 100 TB where
  *      broadcasting a giant key set is not).
  *   2. FIXED 32 SHUFFLE PARTITIONS (the r14 guess): `parts320` scales
  *      spark.sql.shuffle.partitions with the data.
  *
  * Per (query, rung, variant): min-of-reps wall, min-of-reps task CPU
  * (Bench.CpuTally), and the join operators in the executed plan — so the
  * artifact shows WHICH plan ran, not just how long it took.
  *
  * Usage: ProbePlanFlip <x10dir> <x100dir> [query...]
  */
object ProbePlanFlip {

  private val DefaultQueries = Seq("q04_semi_join", "q09_anti_join",
    "q41_cosine_pairs", "q47_ngram_jaccard_topk", "q11_pagination")

  private val Variants: Seq[(String, Map[String, String])] = Seq(
    "default" -> Map(),
    "bhj" -> Map("spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString),
    "shj" -> Map("spark.sql.join.preferSortMergeJoin" -> "false"),
    "parts320" -> Map("spark.sql.shuffle.partitions" -> "320"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbePlanFlip <x10dir> <x100dir> [query...]")
    val dirs = Seq("x10" -> args(0), "x100" -> args(1))
    val queries = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new Bench.CpuTally
    spark.sparkContext.addSparkListener(tally)

    val defaults = Variants.flatMap(_._2.keys).distinct
      .map(k => k -> spark.conf.get(k)).toMap

    def r3(x: Double) = math.round(x * 1000.0) / 1000.0

    val legs = for {
      q <- queries
      (rung, dir) <- dirs
      (vname, conf) <- Variants
    } yield {
      defaults.foreach { case (k, v) => spark.conf.set(k, v) }
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = SparkEntry.queries(q)(spark, dir)
      // executed plan AFTER one materialization so AQE's final shape is
      // what gets named (the initial plan can differ — that's the point)
      Bench.materialize(df) // warm: plan + codegen + AQE settle
      val joins = {
        val p = df.queryExecution.executedPlan.toString()
        Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin")
          .map(j => j -> p.sliding(j.length).count(_ == j))
          .filter(_._2 > 0).map { case (j, c) => s"$j:$c" }.mkString(",")
      }
      val runs = (1 to reps).map { _ =>
        val cpu0 = tally.settled()
        val t0 = System.nanoTime()
        Bench.materialize(SparkEntry.queries(q)(spark, dir))
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (tally.settled() - cpu0) / 1e9
        (wall, cpu)
      }
      s"""{"query":"$q","rung":"$rung","variant":"$vname","joins":"$joins",""" +
        s""""wall_min":${r3(runs.map(_._1).min)},"cpu_min":${r3(runs.map(_._2).min)},""" +
        s""""wall_reps":[${runs.map(r => r3(r._1)).mkString(",")}],""" +
        s""""cpu_reps":[${runs.map(r => r3(r._2)).mkString(",")}]}"""
    }
    defaults.foreach { case (k, v) => spark.conf.set(k, v) }
    println(s"""{"probe":"plan_flip_cluster","reps":$reps,"statistic":"min_of_reps",""" +
      s""""note":"r15 cpu-superlinear cluster: default vs bhj(64MB broadcast) vs shj(preferSortMergeJoin=false) vs parts320(shuffle.partitions=320) on the 10x/100x replica rungs",""" +
      s""""legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}

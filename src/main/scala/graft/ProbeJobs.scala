package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query job/stage-count probe (r17 optimization round).
  *
  * At the bench SF the corpus is MBs, so per-query wall is dominated by the
  * NUMBER of sequential Spark jobs (driver scheduling, barrier sync) rather
  * than data volume — BENCH_detail shows wall >> cpu/cores on every heavy
  * query. This probe counts, for one steady-state noop materialization of
  * each query: jobs launched, stages completed, tasks completed, and wall —
  * the denominator evidence for every job-floor cut in OPTIMIZATION_r17.md.
  *
  * Usage: runMain graft.ProbeJobs <sfDir> [q1,q2,...]
  * Emits one JSON line per query to stdout.
  */
object ProbeJobs {

  final class JobTally extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(sc.stageInfo.numTasks.toLong); ()
    }
    def snapshot(): (Long, Long, Long) = {
      // same settle discipline as Bench.CpuTally: poll until stable
      var prev = (-1L, -1L, -1L)
      var cur = (jobs.get(), stages.get(), tasks.get())
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 200) {
        prev = cur; Thread.sleep(10)
        cur = (jobs.get(), stages.get(), tasks.get()); spins += 1
        if (cur == prev) stable += 1 else stable = 0
      }
      cur
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    picked.foreach { case (name, fn) =>
      try {
        Bench.materialize(fn(spark, sfDir)) // warm: codegen + JIT
        val (j0, s0, t0) = tally.snapshot()
        val t = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        val wall = (System.nanoTime() - t) / 1e9
        val (j1, s1, t1) = tally.snapshot()
        println(s"""{"q":"$name","jobs":${j1 - j0},"stages":${s1 - s0},""" +
          s""""tasks":${t1 - t0},"wall":${math.round(wall * 1000.0) / 1000.0}}""")
      } catch {
        case e: Throwable =>
          println(s"""{"q":"$name","err":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}

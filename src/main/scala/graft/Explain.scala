package graft

/** Dev tool: print one query's formatted plan and its isolated wall time.
  * Usage: runMain graft.Explain <query> [sfdir]  (default /root/testdata/sf0.1;
  * SPARK_GRAFT_CPUS overrides the local core count, default 8;
  * SPARK_GRAFT_PASSES overrides the pass count, default 2).
  *
  * Each ELAPSED line also carries the pass's scheduled job count, summed
  * task time, and summed executorCpuTime: on a noisy multi-tenant host,
  * wall time alone cannot separate "the engine did more work" from "the
  * host stole cycles" — taskSec is the engine's own work ledger (r13: the
  * q_dedup_contain regression hid in wall-time noise for a whole round
  * until taskSec showed 3x the execution work of the prior tree, pass
  * after pass) and cpuSec is steal-proof (see [[TaskLedger]]). STAGE lines
  * flag any stage over 3 s of task time, the granularity the diagnosis
  * actually needs.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = GraftSession(s"local[$cpus]", 32)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val q = SparkEntry.registry.find(_.name == args(0)).getOrElse(
      sys.error(s"unknown query '${args(0)}'; known: " +
        SparkEntry.registry.map(_.name).mkString(", ")))
    val ledger = new TaskLedger(spark.sparkContext)
    ledger.onStage = { sc =>
      val si = sc.stageInfo
      if (si.taskMetrics.executorRunTime > 3000)
        println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"runMs=${si.taskMetrics.executorRunTime}%8d " +
          f"cpuMs=${si.taskMetrics.executorCpuTime / 1000000}%8d " +
          f"shufOut=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%8d")
    }
    q.run(spark, d).explain("formatted")
    // Counters are read only between drained bus states (r15: a true
    // waitUntilEmpty barrier via TaskLedger, replacing the fixed 300 ms
    // sleep — ADVICE r13/r14), then reset at the START of each pass so
    // the attribution window is exactly [q.run, drain] (jobs run during
    // the explain/construction phase above would otherwise be charged to
    // pass 1).
    println(s"DRAIN mode=${ledger.drainMode}")
    // two passes by default: the first pays JIT/codegen/page-cache warm-up,
    // the second is comparable to Bench's min-of-two convention. Each pass
    // re-runs q.run too, matching Bench.timeOne's accounting — for most
    // queries construction is free, but iterative operators
    // (connectedComponents' eager label rounds, memoized codebook fits) do
    // real work there and a build-once harness would silently exclude it.
    for (pass <- 1 to passes) {
      ledger.drain(); ledger.reset()
      val t0 = System.nanoTime()
      q.run(spark, d).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      ledger.drain()
      println(s"ELAPSED pass $pass: $wall " +
        s"jobs=${ledger.jobs.get()} taskSec=${ledger.taskSec} " +
        s"cpuSec=${ledger.cpuSec}")
    }
    spark.stop()
  }
}

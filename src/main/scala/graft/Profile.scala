package graft

/** Dev measurement harness for the optimization rounds: run MANY queries
  * in ONE session (JVM/codegen warm like Bench), and for each emit
  *  - the formatted physical plan to plans/<tag>/<query>_<suffix>.txt
  *    (the judge-checkable plan artifact), and
  *  - per-pass ELAPSED lines (wall, jobs, taskSec, cpuSec via TaskLedger)
  *    plus STAGE lines for any stage over 1 s of task time — the
  *    stage-level attribution guide §1 asks for before touching anything.
  *
  * Usage: runMain graft.Profile <suffix> <query...>  (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS default 32, SPARK_GRAFT_PASSES default 2,
  * SPARK_GRAFT_PLANDIR default plans/r16). Measurement-only tooling — no
  * registered query flows through here.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val planDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANDIR", "plans/r16"))
    java.nio.file.Files.createDirectories(planDir)
    val spark = GraftSession(s"local[$cpus]", shufflePartitions = cpus)
    val ledger = new TaskLedger(spark.sparkContext)
    val stageLines = new java.lang.StringBuilder
    ledger.onStage = { sc =>
      val si = sc.stageInfo
      if (si.taskMetrics.executorRunTime > 1000)
        stageLines.append(
          f"STAGE ${si.stageId}%5d tasks=${si.numTasks}%4d " +
          f"runMs=${si.taskMetrics.executorRunTime}%8d " +
          f"cpuMs=${si.taskMetrics.executorCpuTime / 1000000}%8d " +
          f"shufOutRec=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%9d " +
          f"shufOutMB=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576}%5d " +
          f"inRec=${si.taskMetrics.inputMetrics.recordsRead}%9d\n")
    }
    // warm once so pass 1 of the first query isn't charged global JIT
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val qs = names.map(n => SparkEntry.registry.find(_.name == n).getOrElse(
      sys.error(s"unknown query '$n'")))
    for (q <- qs) {
      val plan = q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(planDir.resolve(s"${q.name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"==== ${q.name}")
      for (pass <- 1 to passes) {
        stageLines.setLength(0)
        ledger.drain(); ledger.reset()
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          ledger.drain()
          if (pass == passes) print(stageLines)
          println(f"ELAPSED ${q.name} pass $pass: $wall%.3f " +
            f"jobs=${ledger.jobs.get()} taskSec=${ledger.taskSec}%.1f " +
            f"cpuSec=${ledger.cpuSec}%.1f")
        } catch {
          case e: Throwable =>
            ledger.drain()
            println(s"FAILED ${q.name} pass $pass: ${e.getClass.getSimpleName}")
        } finally CacheBag.release()
      }
    }
    spark.stop()
  }
}

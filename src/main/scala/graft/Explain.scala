package graft

/** Dev tool: print one query's formatted plan and its isolated wall time.
  * Usage: runMain graft.Explain <query> [sfdir]  (default /root/testdata/sf0.1;
  * SPARK_GRAFT_CPUS overrides the local core count, default 8).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession(s"local[$cpus]", 32)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val q = SparkEntry.registry.find(_.name == args(0)).getOrElse(
      sys.error(s"unknown query '${args(0)}'; known: " +
        SparkEntry.registry.map(_.name).mkString(", ")))
    q.run(spark, d).explain("formatted")
    // two passes: the first pays JIT/codegen/page-cache warm-up, the second
    // is comparable to Bench's min-of-two convention. Each pass re-runs
    // q.run too, matching Bench.timeOne's accounting — for most queries
    // construction is free, but iterative operators (connectedComponents'
    // eager label rounds, memoized codebook fits) do real work there and
    // a build-once harness would silently exclude it.
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      q.run(spark, d).write.format("noop").mode("overwrite").save()
      println(s"ELAPSED pass $pass: ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

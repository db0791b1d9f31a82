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
    val df = q.run(spark, d)
    df.explain("formatted")
    // two passes: the first pays JIT/codegen/page-cache warm-up, the second
    // is comparable to Bench's min-of-two convention
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"ELAPSED pass $pass: ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

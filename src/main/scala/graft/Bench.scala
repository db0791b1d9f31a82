package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", shufflePartitions = cpus)
    // Warm the JVM/codegen once so per-query numbers measure the plan,
    // not first-call JIT + parquet footer reads.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.registry.map { q =>
      // noop write materializes every column of every row — unlike count(),
      // which lets Spark prune the whole projection away. Two timed runs,
      // min taken: the first run absorbs codegen compilation and any
      // transient host contention.
      def once(): Double = {
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> math.min(once(), once())
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

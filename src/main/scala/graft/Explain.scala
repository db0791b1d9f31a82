package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", 32)
    val d = "/root/testdata/sf0.1"
    val q = SparkEntry.registry.find(_.name == args(0)).get
    val df = q.run(spark, d)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"ELAPSED ${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}

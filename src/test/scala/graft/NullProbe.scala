package graft

import org.apache.spark.sql.functions._

/** One-off diagnostic main (test scope, not shipped): classify every
  * registered query's null-text contract empirically — plant a null-text
  * doc in a copy of sf0.001 and report whether each per-doc output keeps
  * or drops it. Feeds the NullContractSpec allowlist; kept for re-probing
  * when operators are added.
  */
object NullProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val src = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("nullprobe").toString
    // copy the full table set so every query runs
    for (f <- new java.io.File(src).listFiles()) {
      val name = f.getName
      spark.read.parquet(s"$src/$name").write.mode("overwrite")
        .parquet(s"$tmp/$name")
    }
    import spark.implicits._
    Seq((999999L, null.asInstanceOf[String], "en", "probe", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("append").parquet(s"$tmp/documents.parquet")
    spark.conf.set("graft.ann.indexRoot",
      java.nio.file.Files.createTempDirectory("nullprobe_idx").toString)
    for (q <- SparkEntry.registry) {
      val r = try {
        val df = q.run(spark, tmp)
        if (df.columns.contains("doc_id"))
          if (df.where(col("doc_id") === 999999L).count() > 0) "KEEP" else "DROP"
        else s"NO_DOC_COL(${df.columns.take(6).mkString(",")})"
      } catch {
        case e: Throwable =>
          s"ERROR(${e.getClass.getSimpleName}:${Option(e.getMessage).getOrElse("").replace('\n', ' ').take(90)})"
      } finally CacheBag.release()
      println(s"PROBE ${q.name} $r")
    }
    spark.stop()
  }
}

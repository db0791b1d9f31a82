package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** The persisted fit/serve split (r7): the fitted ANN index (IVF codebook +
  * cell-partitioned corpus, PQ codebook + packed codes) is written as
  * parquet keyed by the table's physical fingerprint and served across
  * session restarts — Lloyd and the corpus encode run at most ONCE per
  * table content.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def writeVecs(dir: String, seed: Int, n: Int = 256): Unit =
    (0 until n).map(i => (i.toLong,
      Array.tabulate(8)(j => (((i * 7 + j * 13 + seed * 5) % 17) - 8).toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  private def rmTree(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("persisted ANN index: fit once, serve across restarts, refit + prune on rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("graftannidx").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftannroot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      writeVecs(tmp, 0)
      val (ivf0, pq0, lsh0) =
        (AnnIndex.ivfFits.get(), AnnIndex.pqFits.get(), AnnIndex.lshEncodes.get())
      val ivfOut1 = Similarity.annIvf.run(spark, tmp).collect().map(_.toSeq).toSeq
      val pqOut1 = Similarity.annPq.run(spark, tmp).collect().map(_.toSeq).toSeq
      val lshOut1 = Similarity.annLsh.run(spark, tmp).collect().map(_.toSeq).toSeq
      assert(ivfOut1.nonEmpty && pqOut1.nonEmpty && lshOut1.nonEmpty)
      assert(AnnIndex.ivfFits.get() == ivf0 + 1, "first serve must fit IVF once")
      assert(AnnIndex.pqFits.get() == pq0 + 1, "first serve must fit PQ once")
      assert(AnnIndex.lshEncodes.get() == lsh0 + 1, "first serve must encode LSH once")
      // the artifact layout is on disk, complete
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val version = tableDir.listFiles().head
      for (part <- Seq("ivf_codebook", "ivf_cells", "pq_codebook", "pq_codes",
          "lsh_sigs", "_GRAFT_OK_IVF", "_GRAFT_OK_PQ", "_GRAFT_OK_LSH"))
        assert(new java.io.File(version, part).exists(), s"missing $part")
      // the cells corpus is hive-partitioned by cell — the directory
      // layout IS the inverted file
      assert(version.toPath.resolve("ivf_cells").toFile.listFiles()
        .count(_.getName.startsWith("cluster=")) > 1)

      // "restart": drop the in-JVM memos; a second serve must LOAD, not
      // retrain, and produce the identical result (LSH has no memo — its
      // guard is the completion marker itself)
      Similarity.clearMemos()
      val ivfOut2 = Similarity.annIvf.run(spark, tmp).collect().map(_.toSeq).toSeq
      val pqOut2 = Similarity.annPq.run(spark, tmp).collect().map(_.toSeq).toSeq
      val lshOut2 = Similarity.annLsh.run(spark, tmp).collect().map(_.toSeq).toSeq
      assert(AnnIndex.ivfFits.get() == ivf0 + 1, "restart retrained IVF instead of loading")
      assert(AnnIndex.pqFits.get() == pq0 + 1, "restart retrained PQ instead of loading")
      assert(AnnIndex.lshEncodes.get() == lsh0 + 1, "restart re-encoded LSH instead of loading")
      assert(ivfOut2 == ivfOut1, "IVF results diverged after serving from disk")
      assert(pqOut2 == pqOut1, "PQ results diverged after serving from disk")
      assert(lshOut2 == lshOut1, "LSH results diverged after serving from disk")

      // rewrite the table (same path, same cardinality, different
      // content): the fingerprint changes, both families refit, and the
      // stale index version is pruned
      writeVecs(tmp, 1)
      Similarity.clearMemos()
      val ivfOut3 = Similarity.annIvf.run(spark, tmp).collect().map(_.toSeq).toSeq
      val pqOut3 = Similarity.annPq.run(spark, tmp).collect().map(_.toSeq).toSeq
      Similarity.annLsh.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 2, "rewrite must refit IVF")
      assert(AnnIndex.pqFits.get() == pq0 + 2, "rewrite must refit PQ")
      assert(AnnIndex.lshEncodes.get() == lsh0 + 2, "rewrite must re-encode LSH")
      assert(ivfOut3 != ivfOut1 || pqOut3 != pqOut1,
        "rewritten table served the stale index")
      assert(tableDir.listFiles().length == 1, "stale index version not pruned")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }
}

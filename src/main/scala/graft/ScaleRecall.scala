package graft

/** Scale-smoke recall audit (r15, verdict r14 #5): recall@k of every
  * approximate ANN family against q_ann_topk's exact brute-force output,
  * on whatever corpus the argument (or SPARK_GRAFT_SF_DIR) points at.
  * Built for the MakeScale scale corpora: mass duplication skews k-means
  * centroids and LSH band occupancy — exactly the regime the 100× bench
  * smokes run in — and the dev-scale spec floor (AnnIndexSpec, recall
  * ≥0.8) never exercised it. The renumbered MakeScale mode is covered by
  * the same audit (distinct-content ×factor is the opposite skew).
  *
  * Prints one JSON line with per-family recall and exits non-zero below
  * the floor, so a scale run can gate on it mechanically; results are
  * recorded in SURVEY §5 per round.
  *
  * Usage: runMain graft.ScaleRecall [sfDir]
  */
object ScaleRecall {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", shufflePartitions = cpus)
    import spark.implicits._
    import graft.operators.Similarity
    def pairs(q: Q): Set[(Long, Long)] =
      q.run(spark, d).select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.annTopK)
    require(brute.nonEmpty, "exact top-k returned no rows — nothing to audit")
    val fams = Seq("lsh" -> Similarity.annLsh, "ivf" -> Similarity.annIvf,
      "pq" -> Similarity.annPq, "ivfpq" -> Similarity.annIvfPq)
    val recalls = fams.map { case (n, q) =>
      n -> (pairs(q) & brute).size.toDouble / brute.size
    }
    val floor = 0.8
    val pass = recalls.forall(_._2 >= floor)
    println(recalls.map { case (n, r) => s""""$n":$r""" }
      .mkString("{", ",", s""","floor":$floor,"pass":$pass,"n_exact":${brute.size},"sf":"$d"}"""))
    spark.stop()
    if (!pass) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Dedup, Similarity}

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
      for (part <- Seq("ivf_codebook", "ivf2_cells", "pq_codebook", "pq2_codes",
          "lsh2_sigs", "lsh2_ehs", "_GRAFT_OK_IVF2", "_GRAFT_OK_PQ2",
          "_GRAFT_OK_LSH2"))
        assert(new java.io.File(version, part).exists(), s"missing $part")
      // the cells corpus is hive-partitioned by cell — the directory
      // layout IS the inverted file
      assert(version.toPath.resolve("ivf2_cells").toFile.listFiles()
        .count(_.getName.startsWith("cluster=")) > 1)
      // r12: artifacts are eh-keyed, ONE row per DISTINCT vector — this
      // generator's period-17 content space means 256 corpus rows store
      // exactly 17 index rows
      assert(spark.read.parquet(s"$version/pq2_codes").count() == 17L,
        "pq2_codes must hold one row per distinct vector")
      assert(spark.read.parquet(s"$version/ivf2_cells").count() == 17L,
        "ivf2_cells must hold one row per distinct vector")

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

  private def appendVecs(dir: String, ids: Range, seed: Int = 0): Unit =
    ids.map(i => (i.toLong,
      Array.tabulate(8)(j => (((i * 7 + j * 13 + seed * 5) % 17) - 8).toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(1).write.mode("append").parquet(s"$dir/embeddings.parquet")

  test("incremental append: delta-only encode with frozen codebooks; refit past the drift threshold") {
    val tmp = java.nio.file.Files.createTempDirectory("graftannapp").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftannapproot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      writeVecs(tmp, 0)
      val (ivf0, pq0, lsh0) =
        (AnnIndex.ivfFits.get(), AnnIndex.pqFits.get(), AnnIndex.lshEncodes.get())
      val (ivfA0, pqA0, lshA0) =
        (AnnIndex.ivfAppends.get(), AnnIndex.pqAppends.get(), AnnIndex.lshAppends.get())
      Similarity.annIvf.run(spark, tmp).collect()
      Similarity.annPq.run(spark, tmp).collect()
      Similarity.annLsh.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 1 && AnnIndex.pqFits.get() == pq0 + 1 &&
        AnnIndex.lshEncodes.get() == lsh0 + 1)

      // ingest batch: 64 new vectors land as NEW parquet files in the same
      // table dir (the q_dedup_incremental steady state). Appended mass
      // 64/320 = 0.2 ≤ refitFraction, so the index must APPEND — frozen
      // codebooks, delta-only encode — not refit.
      appendVecs(tmp, 256 until 320)
      Similarity.clearMemos()
      Similarity.annIvf.run(spark, tmp).collect()
      val lshOut = Similarity.annLsh.run(spark, tmp)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      Similarity.annPq.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 1, "append must not re-run Lloyd (IVF)")
      assert(AnnIndex.pqFits.get() == pq0 + 1, "append must not re-run Lloyd (PQ)")
      assert(AnnIndex.lshEncodes.get() == lsh0 + 1, "append must not re-encode the corpus (LSH)")
      assert(AnnIndex.ivfAppends.get() == ivfA0 + 1 &&
        AnnIndex.pqAppends.get() == pqA0 + 1 && AnnIndex.lshAppends.get() == lshA0 + 1,
        "every family must take the append path")
      // r12 contract: the appended batch is 100% KNOWN content (this
      // generator's period-17 formula duplicates existing vectors), so
      // the eh-keyed delta artifacts hold ZERO rows — duplication adds
      // member rows at serve, never index rows
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val tip = tableDir.listFiles().find(_.getName.endsWith("_320")).get
      assert(spark.read.schema("eh string, code bigint, nrm double")
          .parquet(s"$tip/pq2_codes").count() == 0L,
        "pq2_codes delta must be empty for known content")
      assert(spark.read.schema(
            "eh string, v array<double>, nrm double, cluster long")
          .parquet(s"$tip/ivf2_cells").count() == 0L,
        "ivf2_cells delta must be empty for known content")
      assert(spark.read.parquet(s"$tip/lsh2_ehs").count() == 17L,
        "the known-content registry must stay the 17 distinct vectors")
      assert(tableDir.listFiles().length == 2, "append must chain to the base, not clone it")
      // recall floor holds through the appended (frozen-parameter) index
      val brute = Similarity.annTopK.run(spark, tmp)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (lshOut & brute).size.toDouble / brute.size
      assert(recall >= 0.8, s"post-append LSH recall $recall below the 0.8 floor")

      // a batch with GENUINELY NOVEL vectors (distinct 1031-modulus
      // content space, disjoint from the 17-point base space) delta-
      // encodes exactly its distinct vectors — the batch-only proof
      (320 until 344).map(i => (i.toLong,
          Array.tabulate(8)(j => (((i * 7 + j * 13) % 1031) - 515).toFloat)))
        .toDF("vec_id", "embedding")
        .repartition(1).write.mode("append").parquet(s"$tmp/embeddings.parquet")
      Similarity.clearMemos()
      Similarity.annIvf.run(spark, tmp).collect()
      Similarity.annPq.run(spark, tmp).collect()
      Similarity.annLsh.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 1 && AnnIndex.pqFits.get() == pq0 + 1 &&
        AnnIndex.lshEncodes.get() == lsh0 + 1, "novel append must not refit")
      val tip2 = tableDir.listFiles().find(_.getName.endsWith("_344")).get
      assert(spark.read.parquet(s"$tip2/pq2_codes").count() == 24L,
        "pq2_codes delta must be exactly the novel distinct vectors")
      assert(spark.read.parquet(s"$tip2/ivf2_cells").count() == 24L,
        "ivf2_cells delta must be exactly the novel distinct vectors")
      assert(spark.read.parquet(s"$tip2/lsh2_ehs").count() == 41L,
        "registry must grow to base ∪ novel distinct vectors")

      // final batch pushes cumulative appended mass past the drift
      // threshold: (480-256)/480 = 0.47 > 0.3 ⇒ full refit, chain collapses
      appendVecs(tmp, 344 until 480)
      Similarity.clearMemos()
      Similarity.annIvf.run(spark, tmp).collect()
      Similarity.annPq.run(spark, tmp).collect()
      Similarity.annLsh.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 2, "drift past threshold must refit IVF")
      assert(AnnIndex.pqFits.get() == pq0 + 2, "drift past threshold must refit PQ")
      assert(AnnIndex.lshEncodes.get() == lsh0 + 2, "drift past threshold must re-encode LSH")
      assert(AnnIndex.ivfAppends.get() == ivfA0 + 2, "refit must not also append")
      assert(tableDir.listFiles().length == 1, "refit did not collapse the chain")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("LEX: persisted postings serve BM25; append is lossless; truncation refuses to serve") {
    val tmp = java.nio.file.Files.createTempDirectory("graftlex").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftlexroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftlexroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def docsDf(ids: Range) = ids.map { i =>
      val text = s"shared alpha${i % 3} beta${i % 2} tok$i " +
        s"common${i % 5} filler${i % 7} word$i"
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      docsDf(0 until 40).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.lexEncodes.get(), AnnIndex.lexAppends.get())
      graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      assert(AnnIndex.lexEncodes.get() == e0 + 1)
      graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      assert(AnnIndex.lexEncodes.get() == e0 + 1 &&
        AnnIndex.lexAppends.get() == a0, "second serve must load, not rebuild")
      // the postings landed hive-partitioned by term slot
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val tip0 = tableDir.listFiles().head
      assert(new java.io.File(s"$tip0/lex_tf").listFiles()
        .exists(_.getName.startsWith("tslot=")), "postings are not slot-partitioned")
      // ingest batch appends as new files: delta-only encode, df/totals merge
      docsDf(40 until 50).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out2 = graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      assert(AnnIndex.lexAppends.get() == a0 + 1 &&
        AnnIndex.lexEncodes.get() == e0 + 1, "append must not re-tokenize the corpus")
      val tip = tableDir.listFiles().find(_.getName.endsWith("_50")).get
      assert(spark.read.parquet(s"$tip/lex_dl").count() == 10L,
        "dl delta is not batch-sized")
      // LOSSLESS: a fresh build over the appended corpus is bit-identical
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val out3 = graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      assert(AnnIndex.lexEncodes.get() == e0 + 2)
      assert(out2.map(_.toString).sorted.toSeq == out3.map(_.toString).sorted.toSeq,
        "chained index diverges from a fresh build — the merge is not exact")
      // truncation: eat one slot partition, force re-validation → refuse
      val freshTip = new java.io.File(freshRoot).listFiles().head.listFiles().head
      val slotDir = new java.io.File(s"$freshTip/lex_tf").listFiles()
        .find(_.getName.startsWith("tslot=")).get
      rmTree(slotDir.toString)
      AnnIndex.resetValidation()
      intercept[IllegalStateException] {
        graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      }
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("bm25 rep-level serve replays bit-exact on a heavily duplicated corpus") {
    // the r11 th-keyed serve's stress regime, which the near-duplicate-free
    // gate corpus barely exercises: 40 docs over 8 distinct texts (up to
    // 10× duplication), member-weighted df, score TIES across every
    // duplicate group, the query's own duplicated text, and a candidate
    // set (≈39 per query) that the member-mass trim must cut to exactly
    // the top-10 a per-doc evaluation produces. Local reference mirrors
    // the engine's IEEE expressions term for term (same tokenize, same
    // idf/tf factor order, same term-sorted fold, same tie order).
    val texts = Seq(
      "alpha beta gamma delta", "alpha beta epsilon zeta",
      "gamma delta eta theta", "alpha gamma epsilon eta",
      "beta delta zeta theta", "alpha beta gamma theta",
      "delta epsilon zeta eta", "iota kappa lambda mu")
    val assign = Seq(0, 0, 1, 2, 3) ++ // queries: docs 0..4
      Seq.fill(8)(0) ++ Seq.fill(6)(1) ++ Seq.fill(6)(2) ++ Seq.fill(6)(3) ++
      Seq.fill(4)(4) ++ Seq.fill(4)(5) ++ Seq.fill(2)(6) ++ Seq(7)
    val docs = assign.zipWithIndex.map { case (t, i) => (i.toLong, texts(t)) }
    val tmp = java.nio.file.Files.createTempDirectory("graftbm25rep").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftbm25reproot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_terms"), r.getAs[Double]("score"), r.getAs[Long]("rn")))
        .sortBy(x => (x._1, x._5)).toSeq
      // local reference — per-DOC evaluation, no rep-level machinery
      val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
        id -> t.trim.split(" +").toSeq.groupBy(identity)
          .map { case (w, xs) => w -> xs.size.toLong }
      }.toMap
      val n = docs.size.toLong
      val dl = tf.map { case (id, m) => id -> m.values.sum }
      val df = docs.flatMap { case (id, _) => tf(id).keys }
        .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val avgdl = dl.values.sum.toDouble / n.toDouble
      def ts(term: String, d: Long): Double =
        (((n - df(term)).toDouble + 0.5) / (df(term).toDouble + 0.5)) *
          ((tf(d)(term).toDouble * 2.25) /
            (tf(d)(term).toDouble +
              1.25 * (0.25 + 0.75 * (dl(d).toDouble / avgdl))))
      val expected = (0L until 5L).flatMap { q =>
        val qterms = tf(q).keySet
        docs.map(_._1).filter(_ != q).flatMap { d =>
          val shared = qterms.intersect(tf(d).keySet).toSeq.sorted
          if (shared.isEmpty) None
          else Some((q, d, shared.size.toLong,
            shared.foldLeft(0.0)((s, t) => s + ts(t, d))))
        }.sortBy { case (_, d, _, sc) => (-sc, d) }
          .take(10).zipWithIndex
          .map { case ((qq, d, nt, sc), i) => (qq, d, nt, sc, i.toLong + 1L) }
      }
      assert(got == expected,
        s"rep-level bm25 diverges from the per-doc reference:\n$got\nvs\n$expected")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("LEX compaction: a 3-segment chain collapses to one self-contained version, bit-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graftlexc").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftlexcroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftlexcroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def docsDf(ids: Range) = ids.map { i =>
      val text = s"shared alpha${i % 3} beta${i % 2} tok$i " +
        s"common${i % 5} filler${i % 7} word$i"
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      docsDf(0 until 40).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      // two ingest batches → a 3-segment chain
      docsDf(40 until 46).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      docsDf(46 until 50).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out = graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      val tableDir = new java.io.File(idxRoot).listFiles().head
      assert(tableDir.listFiles().count(_.isDirectory) == 3,
        "expected a 3-segment chain before compaction")
      val (e0, a0) = (AnnIndex.lexEncodes.get(), AnnIndex.lexAppends.get())
      assert(AnnIndex.compactLex(spark, tmp), "chained index must compact")
      assert(AnnIndex.lexEncodes.get() == e0 && AnnIndex.lexAppends.get() == a0,
        "compaction must be a pure parquet merge — no tokenize pass")
      // exactly one self-contained version remains, base pointer cleared
      val vers = tableDir.listFiles().filter(_.isDirectory)
      assert(vers.length == 1, s"bases not pruned: ${vers.mkString(", ")}")
      val meta = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(vers.head, "_GRAFT_META_LXT").toPath), "UTF-8")
      assert(meta.contains("base=-"), s"base pointer survives compaction: $meta")
      // serve through the compacted index: identical rows, still no encode
      val out2 = graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      assert(AnnIndex.lexEncodes.get() == e0 && AnnIndex.lexAppends.get() == a0)
      assert(out.map(_.toString).sorted.toSeq == out2.map(_.toString).sorted.toSeq,
        "compaction changed the ranking")
      // and bit-identical to a from-scratch build of the same corpus
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val out3 = graft.operators.TextAnalysis.bm25.run(spark, tmp).collect()
      assert(out2.map(_.toString).sorted.toSeq == out3.map(_.toString).sorted.toSeq,
        "compacted index diverges from a fresh build")
      // no-op on an already-compacted index
      spark.conf.set("graft.ann.indexRoot", idxRoot)
      assert(!AnnIndex.compactLex(spark, tmp))
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("text signature index: encode once per distinct content; appends add only novel texts") {
    val tmp = java.nio.file.Files.createTempDirectory("graftsig").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftsigroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftsigroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val base = (0L until 30L).map(i =>
      i -> s"document body tok$i alpha${i % 3} beta${i % 5} gamma delta epsilon")
    try {
      docsDf(base).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.sigEncodes.get(), AnnIndex.sigAppends.get())
      graft.operators.Dedup.minhashLsh.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 1)
      graft.operators.Dedup.minhashLsh.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 1 &&
        AnnIndex.sigAppends.get() == a0, "second run must load, not re-encode")
      // simhash persists its own family under the same version
      graft.operators.Dedup.simhash.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 2)
      // the ngram family persists shingle rows (hash-gated operator — the
      // DuckDB gate proves the persisted path is byte-identical)
      graft.operators.Dedup.ngramJaccard.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 3)
      graft.operators.Dedup.ngramJaccard.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 3,
        "second ngram run must load the shingle table, not re-explode")
      // ingest batch: 2 novel texts + 1 exact duplicate of a known text —
      // the th-keyed artifact must grow by DISTINCT CONTENT only
      val delta = Seq(
        100L -> "a genuinely novel appended document body one two three",
        101L -> "another novel appended document body four five six",
        102L -> base.head._2)
      docsDf(delta).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out2 = graft.operators.Dedup.minhashLsh.run(spark, tmp).collect()
      assert(AnnIndex.sigAppends.get() == a0 + 1 &&
        AnnIndex.sigEncodes.get() == e0 + 3,
        "append must encode the batch only, never the corpus")
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val tip = tableDir.listFiles().find(_.getName.endsWith("_33")).get
      assert(spark.read.parquet(s"$tip/mh_sigs").count() == 2,
        "a duplicate of known content must add no signature rows")
      // the new duplicate doc pairs with its original through the
      // UNCHANGED persisted signatures (the within-group device)
      assert(out2.exists(r => r.getAs[Long]("doc_a") == base.head._1 &&
        r.getAs[Long]("doc_b") == 102L), "appended exact dup lost its pair")
      // chained serve ranks identically to a from-scratch build
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = graft.operators.Dedup.minhashLsh.run(spark, tmp).collect()
      assert(out2.map(_.toString).sorted.toSeq ==
        fresh.map(_.toString).sorted.toSeq,
        "chained signature table diverges from a fresh build")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("signature chain compaction: 10 appends serve from ≤2 segments, rows identical to fresh (r15, verdict r14 #8)") {
    val tmp = java.nio.file.Files.createTempDirectory("sigcompact").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("sigcompactroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("sigcompactroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    def body(i: Long) =
      s"compaction corpus doc$i alpha${i % 7} beta${i % 5} gamma delta epsilon zeta eta theta"
    try {
      docsDf((0L until 20L).map(i => i -> body(i))).repartition(1)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.sigEncodes.get(), AnnIndex.sigAppends.get())
      AnnIndex.textSigs(spark, tmp, "NG", Dedup.ngEncode).count()
      assert(AnnIndex.sigChainLen(spark, tmp, "NG") == 1)
      // 10 micro-batch appends, each served: through r14 the chain grew
      // one segment per append until the next full rebuild — every serve
      // paid N partition listings + N small-file scans. The threshold
      // compaction bounds every serve at sigMaxChain segments.
      for (k <- 1 to 10) {
        docsDf(Seq((100L + 2 * k) -> body(100L + 2 * k),
            (101L + 2 * k) -> body(200L + 2 * k)))
          .repartition(1).write.mode("append").parquet(s"$tmp/documents.parquet")
        AnnIndex.textSigs(spark, tmp, "NG", Dedup.ngEncode).count()
        assert(AnnIndex.sigChainLen(spark, tmp, "NG") <= AnnIndex.sigMaxChain,
          s"append $k decayed past the ${AnnIndex.sigMaxChain}-segment bound")
      }
      // compaction is a pure parquet merge: every append delta-encoded
      // (10 appends, zero re-encodes of the corpus)
      assert(AnnIndex.sigAppends.get() == a0 + 10 &&
        AnnIndex.sigEncodes.get() == e0 + 1,
        "compaction must never re-encode or block the delta-append path")
      val served = AnnIndex.textSigs(spark, tmp, "NG", Dedup.ngEncode)
        .collect().map(_.toString).sorted.toSeq
      // row-identical to a from-scratch encode of the final corpus
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = AnnIndex.textSigs(spark, tmp, "NG", Dedup.ngEncode)
        .collect().map(_.toString).sorted.toSeq
      assert(served == fresh,
        "compacted signature chain diverges from a fresh build")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("EP pair index: embed dedup serves the persisted pair graph; fresh build equals the direct plan; appends are delta-only") {
    val tmp = java.nio.file.Files.createTempDirectory("graftep").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftepidx").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftepidx2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    // orthogonal one-hot axes (pairwise cosine ≤ 0.01 ≪ τ); a near-dup
    // adds a small epsilon on the next coordinate (cosine ≈ 0.99995 ≥ τ)
    def vec(axis: Int, eps: Double): Array[Float] =
      (0 until 8).map(j => (if (j == axis) 1.0
        else if (j == (axis + 1) % 8) eps else 0.0).toFloat).toArray
    // ids 1/2 exact dups, 3 a near-dup of them, 4..8 orthogonal spread
    val base0 = Seq(
      1L -> vec(0, 0), 2L -> vec(0, 0), 3L -> vec(0, 0.01),
      4L -> vec(1, 0), 5L -> vec(2, 0), 6L -> vec(3, 0),
      7L -> vec(4, 0), 8L -> vec(5, 0))
    try {
      base0.toDF("vec_id", "embedding").repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/embeddings.parquet")
      val (e0, a0) = (AnnIndex.epEncodes.get(), AnnIndex.epAppends.get())
      val out1 = Similarity.dedupEmbed.run(spark, tmp).collect()
      assert(AnnIndex.epEncodes.get() == e0 + 1)
      // the served graph is row-identical to the direct (non-persisted)
      // plan on the same corpus — the whole point of the parity contract
      val direct = Similarity.embedPairsFrom(Similarity.embedGraphDirect(spark, tmp))
        .transform(graft.Det.sortAll).collect()
      assert(out1.map(_.toString).toSeq == direct.map(_.toString).toSeq,
        "persisted serve diverges from the direct plan")
      Similarity.dedupEmbed.run(spark, tmp).collect()
      assert(AnnIndex.epEncodes.get() == e0 + 1 && AnnIndex.epAppends.get() == a0,
        "second run must load, not re-encode")
      // ingest batch: a near-dup of vector 4 (new pair across the append
      // boundary), plus an exact duplicate of vector 1 (zero new reps for
      // it — within-group pair served from the id mapping alone)
      Seq(20L -> vec(1, 0.01), 21L -> vec(0, 0))
        .toDF("vec_id", "embedding").repartition(1).write.mode("append")
        .parquet(s"$tmp/embeddings.parquet")
      val out2 = Similarity.dedupEmbed.run(spark, tmp).collect()
      assert(AnnIndex.epAppends.get() == a0 + 1 &&
        AnnIndex.epEncodes.get() == e0 + 1,
        "append must delta-encode, never re-encode the corpus")
      val keys2 = out2.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      assert(keys2((4L, 20L)), s"appended near-dup pair missing: $keys2")
      assert(keys2((1L, 21L)) && keys2((2L, 21L)) && keys2((3L, 21L)),
        s"appended exact dup lost member pairs: $keys2")
      // the duplicate vector added no rep row: 7 distinct in the base
      // (ids 1/2 share a vector) + 1 novel appended
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val tip = tableDir.listFiles().find(_.getName.endsWith("_10")).get
      assert(spark.read.parquet(s"$tip/ep_reps").count() == 8,
        "duplicate of a known vector must add no rep rows")
      // chained serve equals a from-scratch build (no caps hit here, so
      // the approximate append is exactly the fresh pair set)
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = Similarity.dedupEmbed.run(spark, tmp).collect()
      assert(out2.map(_.toString).sorted.toSeq == fresh.map(_.toString).sorted.toSeq,
        "chained EP pair graph diverges from a fresh build")
      // semantic dedup rides the same artifact: labels on the appended
      // corpus equal the closure (fresh root still set)
      val sem = Similarity.semanticDedup.run(spark, tmp).collect()
      val cl = sem.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 1L && cl(21L) == 1L)
      assert(cl(4L) == 4L && cl(20L) == 4L)
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("KN pair graph: no false pairs, degree ≤ k, measured ε-graph recall at dev scale; fit once per version (r16)") {
    val dir = "/root/testdata/sf0.01"
    val (e0, a0) = (AnnIndex.knEncodes.get(), AnnIndex.knAppends.get())
    val out = Similarity.dedupEmbedKnn.run(spark, dir)
    val knnPairs = out.select("rep_a", "rep_b").as[(Long, Long)].collect().toSet
    // no false pairs: the degree-capped graph is exact-rescored, so its
    // pair set must be a SUBSET of the exact ε-graph (restricted to
    // rep-level — the graph never emits within-group member pairs)
    val reps = operators.Members.eh(spark, dir)._2
      .select("vec_id").as[Long].collect().toSet
    val brute = Similarity.bruteForcePairs(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      .filter(p => reps(p._1) && reps(p._2))
    assert(knnPairs.subsetOf(brute),
      s"false pairs: ${(knnPairs -- brute).take(5)}")
    // measured pair-recall vs the exact ε-graph (verdict r15 #1 bar):
    // at dev scale the ε-degree distribution sits under the cap, so the
    // miss axis is cell-probe recall
    val recall = knnPairs.size.toDouble / brute.size
    info(f"kNN pair recall vs exact ε-graph at sf0.01: $recall%.3f (${knnPairs.size}/${brute.size})")
    assert(recall >= 0.8, s"kNN pair recall $recall below the 0.8 floor")
    // degree cap on the persisted directed artifact
    val maxDeg = AnnIndex.knnPairs(spark, dir)
      .groupBy("eh_q").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= AnnIndex.knK, s"degree $maxDeg past the cap")
    // cosines are the exact kernel's bits: re-derive from raw vectors
    val vecsById = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecsById(a), vecsById(b))
      def dot(p: Seq[Double], q: Seq[Double]): Double =
        p.indices.foldLeft(0.0)((s, i) => s + p(i) * q(i))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    out.select("rep_a", "rep_b", "cosine").as[(Long, Long, Double)]
      .collect().take(50).foreach { case (a, b, c) =>
        assert(c == cos(a, b), s"cosine of ($a,$b) diverges from the kernel")
      }
    // second serve loads — the fit ran at most once this session (the
    // IVF artifact may already have existed from earlier suites)
    val e1 = AnnIndex.knEncodes.get()
    assert(e1 <= e0 + 1 && AnnIndex.knAppends.get() == a0)
    Similarity.dedupEmbedKnn.run(spark, dir).collect()
    assert(AnnIndex.knEncodes.get() == e1, "second run must load, not re-fit")
  }

  test("KN append: delta-only merge equals a frozen-geometry rebuild bit-exactly (r16)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftkn").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftknidx").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    // 80 + 12 DISTINCT pseudo-random vectors (no dup collapse — every id
    // is a rep); drift 12/92 = 13% < refitFraction, so the append path
    // runs under the bits/bands/radius frozen in the base fit's meta
    def wv(ids: Range, mode: String): Unit = ids.map(i => (i.toLong,
      Array.tabulate(8)(j => ((i * 31 + j * 17) % 101 - 50).toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(1).write.mode(mode).parquet(s"$tmp/embeddings.parquet")
    try {
      wv(0 until 80, "overwrite")
      val (e0, a0) = (AnnIndex.knEncodes.get(), AnnIndex.knAppends.get())
      AnnIndex.knnPairs(spark, tmp).collect()
      assert(AnnIndex.knEncodes.get() == e0 + 1)
      wv(80 until 92, "append")
      val appended = AnnIndex.knnPairs(spark, tmp)
        .collect().map(_.toString).sorted.toSeq
      assert(AnnIndex.knAppends.get() == a0 + 1 &&
        AnnIndex.knEncodes.get() == e0 + 1,
        "append must merge delta edges, never refit")
      // frozen-geometry rebuild: drop ONLY the KN artifacts (both the
      // tip and the base marker, so appendBase can't re-append) and
      // rebuild — the fresh solve at n=92 equals the base solve at n=80
      // (same bits bucket), so the rebuild sees the exact candidate
      // universe the append merged over, and top-k(A ∪ B) =
      // top-k(top-k(A) ∪ B) must make the two artifacts row-identical
      // including ranks
      val tableDir = new java.io.File(idxRoot).listFiles().head
      for (vdir <- tableDir.listFiles(); if vdir.isDirectory) {
        rmTree(s"${vdir.getAbsolutePath}/kn_pairs")
        rmTree(s"${vdir.getAbsolutePath}/kn_ehs")
        new java.io.File(vdir, "_GRAFT_OK_KN").delete()
        new java.io.File(vdir, "_GRAFT_META_KN").delete()
      }
      val rebuilt = AnnIndex.knnPairs(spark, tmp)
        .collect().map(_.toString).sorted.toSeq
      assert(AnnIndex.knEncodes.get() == e0 + 2,
        "marker removal must force a fresh KN build")
      assert(appended == rebuilt,
        "appended KN graph diverges from the frozen-geometry rebuild")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("KN ivf-mode: a dense-regime budget flips the build to cell locality; append equals a frozen-codebook rebuild (r16)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftkni").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftkniidx").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    // budget 1 forces the dense-regime path regardless of corpus — the
    // mode decision itself is the ballEstimate > budget comparison
    spark.conf.set("graft.knn.candBudget", "1")
    def wv(ids: Range, mode: String): Unit = ids.map(i => (i.toLong,
      Array.tabulate(8)(j => ((i * 31 + j * 17) % 101 - 50).toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(1).write.mode(mode).parquet(s"$tmp/embeddings.parquet")
    try {
      wv(0 until 80, "overwrite")
      val (e0, a0) = (AnnIndex.knEncodes.get(), AnnIndex.knAppends.get())
      val out0 = AnnIndex.knnPairs(spark, tmp)
      assert(AnnIndex.knEncodes.get() == e0 + 1)
      // mode frozen in the meta; no sig artifact in ivf mode
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val v80 = tableDir.listFiles().find(_.getName.endsWith("_80")).get
      val meta = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(v80, "_GRAFT_META_KN").toPath), "UTF-8")
      assert(meta.contains("params=ivf,"), s"dense regime must freeze ivf mode: $meta")
      assert(!new java.io.File(v80, "kn_sigs").exists())
      // degree cap + exactness hold in this mode too
      assert(out0.groupBy("eh_q").count().agg(max("count"))
        .head().getLong(0) <= AnnIndex.knK)
      wv(80 until 92, "append")
      val appended = AnnIndex.knnPairs(spark, tmp)
        .collect().map(_.toString).sorted.toSeq
      assert(AnnIndex.knAppends.get() == a0 + 1 &&
        AnnIndex.knEncodes.get() == e0 + 1,
        "append must merge delta edges under the frozen mode, never refit")
      // frozen-codebook rebuild: drop only the KN artifacts — the IVF
      // chain still serves the codebook frozen at the base fit, so the
      // rebuild sees the exact candidate universe the append merged over
      for (vdir <- tableDir.listFiles(); if vdir.isDirectory) {
        rmTree(s"${vdir.getAbsolutePath}/kn_pairs")
        rmTree(s"${vdir.getAbsolutePath}/kn_ehs")
        new java.io.File(vdir, "_GRAFT_OK_KN").delete()
        new java.io.File(vdir, "_GRAFT_META_KN").delete()
      }
      val rebuilt = AnnIndex.knnPairs(spark, tmp)
        .collect().map(_.toString).sorted.toSeq
      assert(AnnIndex.knEncodes.get() == e0 + 2)
      assert(appended == rebuilt,
        "ivf-mode appended KN graph diverges from the frozen-codebook rebuild")
    } finally {
      spark.conf.unset("graft.knn.candBudget")
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("EC labels: an EP append relabels via the reduced union-find — delta-sized, identical to a fresh build (r13)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftec").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftecidx").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftecidx2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def vec(axis: Int, eps: Double): Array[Float] =
      (0 until 8).map(j => (if (j == axis) 1.0
        else if (j == (axis + 1) % 8) eps else 0.0).toFloat).toArray
    // a vector between axes a and b: cosine ≈ 0.707 to both — a BRIDGE
    def bridge(a: Int, b: Int): Array[Float] =
      (0 until 8).map(j => (if (j == a || j == b) 0.7071 else 0.0).toFloat).toArray
    try {
      // two components ({1,2,3} on axis0, {4,5} on axis1) + singletons
      Seq(1L -> vec(0, 0), 2L -> vec(0, 0), 3L -> vec(0, 0.01),
          4L -> vec(1, 0), 5L -> vec(1, 0.01),
          6L -> vec(2, 0), 7L -> vec(3, 0))
        .toDF("vec_id", "embedding").repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/embeddings.parquet")
      val (ee0, ea0) = (AnnIndex.ecEncodes.get(), AnnIndex.ecAppends.get())
      val sem1 = Similarity.semanticDedup.run(spark, tmp).collect()
      assert(AnnIndex.ecEncodes.get() == ee0 + 1)
      val cl1 = sem1.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(cl1(1L) == 1L && cl1(3L) == 1L && cl1(4L) == 4L && cl1(6L) == 6L)
      // ingest: a bridge MERGING the two components, an exact dup of 6,
      // and a fresh singleton — the three reduced-graph shapes
      Seq(20L -> bridge(0, 1), 21L -> vec(2, 0), 22L -> vec(6, 0))
        .toDF("vec_id", "embedding").repartition(1).write.mode("append")
        .parquet(s"$tmp/embeddings.parquet")
      val sem2 = Similarity.semanticDedup.run(spark, tmp).collect()
      assert(AnnIndex.ecAppends.get() == ea0 + 1 &&
        AnnIndex.ecEncodes.get() == ee0 + 1,
        "an EP append must relabel delta-sized, not re-run the full propagation")
      val cl2 = sem2.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
      for (id <- Seq(1L, 2L, 3L, 4L, 5L, 20L))
        assert(cl2(id) == 1L, s"bridge merge lost member $id: $cl2")
      assert(cl2(6L) == 6L && cl2(21L) == 6L, s"dup-append wrong: $cl2")
      assert(cl2(22L) == 22L, s"fresh singleton mislabeled: $cl2")
      // appended labels are row-identical to a from-scratch build
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = Similarity.semanticDedup.run(spark, tmp).collect()
      assert(AnnIndex.ecEncodes.get() == ee0 + 2, "fresh root must full-build")
      assert(sem2.map(_.toString).sorted.toSeq == fresh.map(_.toString).sorted.toSeq,
        "appended EC labels diverge from a fresh build")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("EP append across a cap-crossing bucket: containment holds — no false pairs, no recall lost vs fresh") {
    // the ADVICE r11 scenario: positive scalings of ONE direction share
    // every hyperplane sign (sign(dot) is scale-invariant), so all
    // vectors land in a single (band, code) bucket per band. Base 240 ≤
    // the 256 bucket cap → all-pairs found; a 60-vector delta pushes the
    // union bucket past the cap, which a FRESH build would DROP
    // (capBuckets skips overlarge buckets — the family's documented
    // recall axis). The append must (a) carry every base pair verbatim,
    // (b) emit only exact-cosine-verified pairs, (c) never have LESS
    // candidate recall than the fresh build — divergence is one-sided.
    val tmp = java.nio.file.Files.createTempDirectory("graftepcap").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftepcaproot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftepcaproot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def wv(ids: Range, mode: String): Unit = ids.map(i => (i.toLong,
      Array.fill(8)((i + 1).toFloat))) // (i+1)·u — distinct, same signs
      .toDF("vec_id", "embedding").repartition(1).write.mode(mode)
      .parquet(s"$tmp/embeddings.parquet")
    try {
      wv(0 until 240, "overwrite")
      val (e0, a0) = (AnnIndex.epEncodes.get(), AnnIndex.epAppends.get())
      val base = Similarity.dedupEmbed.run(spark, tmp).collect()
        .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      assert(AnnIndex.epEncodes.get() == e0 + 1)
      assert(base.size == 240 * 239 / 2,
        s"base bucket under the cap must find all pairs, got ${base.size}")
      wv(240 until 300, "append") // 60/300 = 0.2 < refitFraction
      val appended = Similarity.dedupEmbed.run(spark, tmp).collect()
      assert(AnnIndex.epAppends.get() == a0 + 1 &&
        AnnIndex.epEncodes.get() == e0 + 1, "must append, not refit")
      val appKeys = appended
        .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      assert(base.subsetOf(appKeys), "append lost base pairs")
      // every served pair is a true pair: exact cosine ≥ τ, recomputed
      // locally from the raw vectors
      val vecsById = (0 until 300).map(i =>
        i.toLong -> Array.fill(8)((i + 1).toDouble)).toMap
      def cosine(a: Long, b: Long): Double = {
        val (x, y) = (vecsById(a), vecsById(b))
        val dot = (0 until 8).map(k => x(k) * y(k)).sum
        dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      }
      assert(appKeys.forall { case (a, b) => cosine(a, b) >= Similarity.dedupTau },
        "append emitted a false pair — exact-rescore contract broken")
      // fresh build on the appended corpus: the 300-vector bucket is
      // dropped in every band, so candidate recall collapses — the
      // append's divergence is strictly ADDED recall, never lost
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = Similarity.dedupEmbed.run(spark, tmp).collect()
        .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      assert(fresh.subsetOf(appKeys),
        "fresh build found pairs the append lost — containment broken")
      assert(fresh.isEmpty,
        "scenario no longer exercises the cap (fresh build kept the bucket)")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("prune safety: an EP append completing first must not orphan the IVF chain base") {
    // the r11 ADVICE scenario: after a corpus append, EP (chainless,
    // base=None) is the first family to complete in the NEW version dir
    // — exactly what embedPairsSink does every micro-batch. Its prune
    // must keep the PRIOR version dir that still holds the IVF chain
    // base; pre-fix, chainDirs anchored only {new vd} for families with
    // no meta there and the prune silently forced a full Lloyd refit.
    val tmp = java.nio.file.Files.createTempDirectory("graftprune").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftpruneroot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    // all-distinct vectors (7 invertible mod 1031, ids < 1031) so the EP
    // append has genuinely novel content to delta-encode
    def wv(ids: Range, mode: String): Unit = ids.map(i => (i.toLong,
      Array.tabulate(8)(j => (((i * 7 + j * 13) % 1031) - 515).toFloat)))
      .toDF("vec_id", "embedding").repartition(1).write.mode(mode)
      .parquet(s"$tmp/embeddings.parquet")
    try {
      wv(0 until 256, "overwrite")
      val (ivf0, ivfA0) = (AnnIndex.ivfFits.get(), AnnIndex.ivfAppends.get())
      Similarity.annIvf.run(spark, tmp).collect()
      Similarity.dedupEmbed.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 1)
      // ingest 32 novel vectors (0.11 < drift), then let EP complete
      // FIRST in the new version dir — its prune runs before IVF has any
      // presence there
      wv(256 until 288, "append")
      Similarity.clearMemos()
      Similarity.dedupEmbed.run(spark, tmp).collect()
      val tableDir = new java.io.File(idxRoot).listFiles().head
      assert(tableDir.listFiles().exists(v =>
        new java.io.File(v, "_GRAFT_OK_IVF2").exists()),
        "EP's prune deleted every version holding the IVF artifact")
      // the surviving base must make the next IVF serve an APPEND
      // (frozen codebooks), never a forced full refit
      Similarity.annIvf.run(spark, tmp).collect()
      assert(AnnIndex.ivfFits.get() == ivf0 + 1,
        "EP's prune orphaned the IVF base: full Lloyd refit forced")
      assert(AnnIndex.ivfAppends.get() == ivfA0 + 1,
        "IVF must take the append path after the corpus append")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("ann_topk: rep-level serve over ep_reps is bit-identical to the cold direct scan") {
    // heavily duplicated corpus (13 distinct vectors × ~8 members): the
    // rep path must trim on member mass (a query's own 7-member group
    // fills the top-5 for most queries), expand survivors through the id
    // mapping, and reproduce the cold broadcast scan row for row —
    // including the cross-group cosine ties the trim must never cut.
    val tmp = java.nio.file.Files.createTempDirectory("graftanntopk").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftanntopkroot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      (0 until 100).map(i => (i.toLong,
        Array.tabulate(8)(j => ((((i % 13) * 7 + j * 13) % 29) - 14).toFloat)))
        .toDF("vec_id", "embedding").repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/embeddings.parquet")
      val (e0, r0) = (AnnIndex.epEncodes.get(), Similarity.annTopKRepServes.get())
      val cold = Similarity.annTopK.run(spark, tmp).collect().map(_.toString).toSeq
      assert(AnnIndex.epEncodes.get() == e0 &&
        Similarity.annTopKRepServes.get() == r0,
        "cold ann_topk must not pay an EP fit — the direct scan is its cold path")
      Similarity.dedupEmbed.run(spark, tmp).collect() // the dedup family pays the fit
      assert(AnnIndex.epEncodes.get() == e0 + 1)
      val warm = Similarity.annTopK.run(spark, tmp).collect().map(_.toString).toSeq
      assert(Similarity.annTopKRepServes.get() == r0 + 1,
        "with EP complete, ann_topk must serve the persisted rep table")
      assert(warm == cold,
        "rep-level ann_topk diverges from the direct scan")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("BIN signature index: binary dedup serves persisted payload simhashes; appends add only novel payloads") {
    val tmp = java.nio.file.Files.createTempDirectory("graftbinsig").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftbinroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftbinroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    val base = (1 to 120).map(i => s"w${i % 37}").mkString(" ")
    val edited = base.replace("w5 ", "w999 ")
    val docs0 = Seq(1L -> base, 2L -> edited, 3L -> base,
      4L -> (1 to 120).map(i => s"z$i").mkString(" "))
    try {
      docs0.toDF("doc_id", "text").repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.sigEncodes.get(), AnnIndex.sigAppends.get())
      val out1 = graft.operators.Multimodal.binaryDedup.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 1)
      // planted semantics hold through the persisted path
      val keys1 = out1.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(keys1((1L, 3L)) && keys1((1L, 2L)))
      graft.operators.Multimodal.binaryDedup.run(spark, tmp).collect()
      assert(AnnIndex.sigEncodes.get() == e0 + 1 &&
        AnnIndex.sigAppends.get() == a0, "second run must load, not re-encode")
      // ingest batch: one novel payload + one exact byte-duplicate of a
      // known payload — the th-keyed artifact grows by distinct bytes only
      Seq(10L -> (1 to 120).map(i => s"q$i").mkString(" "), 11L -> base)
        .toDF("doc_id", "text").repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out2 = graft.operators.Multimodal.binaryDedup.run(spark, tmp).collect()
      assert(AnnIndex.sigAppends.get() == a0 + 1 &&
        AnnIndex.sigEncodes.get() == e0 + 1,
        "append must encode the batch only, never the corpus")
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val tip = tableDir.listFiles().find(_.getName.endsWith("_6")).get
      assert(spark.read.parquet(s"$tip/bin_sigs").count() == 1,
        "a duplicate of known bytes must add no signature rows")
      // the appended duplicate pairs with its originals through the
      // UNCHANGED persisted signatures (the within-group device)
      val keys2 = out2.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(keys2((1L, 11L)) && keys2((3L, 11L)), s"appended dup lost pairs: $keys2")
      // chained serve is row-identical to a from-scratch build
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = graft.operators.Multimodal.binaryDedup.run(spark, tmp).collect()
      assert(out2.map(_.toString).sorted.toSeq ==
        fresh.map(_.toString).sorted.toSeq,
        "chained BIN signature table diverges from a fresh build")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("IVFPQ: fit-once, cell-partitioned CODE layout, delta-only append with frozen codebooks") {
    val tmp = java.nio.file.Files.createTempDirectory("graftivfpq").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftivfpqroot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      writeVecs(tmp, 0)
      val (e0, a0) = (AnnIndex.ivfpqEncodes.get(), AnnIndex.ivfpqAppends.get())
      val out1 = Similarity.annIvfPq.run(spark, tmp).collect().map(_.toSeq).toSeq
      assert(out1.nonEmpty)
      assert(AnnIndex.ivfpqEncodes.get() == e0 + 1, "first serve must encode once")
      // the artifact is PQ codes laid out in the inverted file: the
      // partition dirs are cells, the payload schema is the 24 B/vector
      // code row (no raw vector column)
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val version = tableDir.listFiles().head
      val codesDir = new java.io.File(version, "ivfpq2_codes")
      assert(codesDir.listFiles().count(_.getName.startsWith("cluster=")) > 1,
        "ivfpq2_codes is not hive-partitioned by cell")
      assert(spark.read.parquet(codesDir.toString).columns.toSet ==
        Set("eh", "code", "nrm", "cluster"), "code rows must not carry raw vectors")
      // restart: a second serve loads — bit-identical, no re-encode
      Similarity.clearMemos()
      val out2 = Similarity.annIvfPq.run(spark, tmp).collect().map(_.toSeq).toSeq
      assert(AnnIndex.ivfpqEncodes.get() == e0 + 1, "restart re-encoded instead of loading")
      assert(out2 == out1, "results diverged after serving from disk")
      // pure file append within the drift budget: delta-only encode with
      // the base's frozen coarse + PQ codebooks, chained not cloned.
      // r12: the batch is NOVEL distinct content (1031-modulus space,
      // disjoint from the period-17 base), so the eh-keyed delta holds
      // exactly its distinct vectors
      (256 until 320).map(i => (i.toLong,
          Array.tabulate(8)(j => (((i * 7 + j * 13) % 1031) - 515).toFloat)))
        .toDF("vec_id", "embedding")
        .repartition(1).write.mode("append").parquet(s"$tmp/embeddings.parquet")
      Similarity.clearMemos()
      Similarity.annIvfPq.run(spark, tmp).collect()
      assert(AnnIndex.ivfpqEncodes.get() == e0 + 1, "append must not re-encode the corpus")
      assert(AnnIndex.ivfpqAppends.get() == a0 + 1, "append must take the append path")
      val tip = tableDir.listFiles().find(_.getName.endsWith("_320")).get
      assert(spark.read.parquet(s"$tip/ivfpq2_codes").count() == 64L,
        "ivfpq2_codes delta is not exactly the novel distinct batch")
      assert(tableDir.listFiles().length == 2, "append must chain to the base, not clone it")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  test("artifact validation: a truncated corpus artifact refuses to serve") {
    // the completion marker is a promise, not proof — a /tmp cleaner (or a
    // foreign writer under a mis-scoped shared root) can leave a
    // complete-looking version with a short corpus artifact; the serve
    // must fail loud, not silently return partial neighbors
    val tmp = java.nio.file.Files.createTempDirectory("graftannval").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftannvalroot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      writeVecs(tmp, 0)
      Similarity.annPq.run(spark, tmp).collect()
      // truncate pq_codes to half the corpus behind the marker's back
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val vd = tableDir.listFiles().head
      val half = spark.read.parquet(s"$vd/pq2_codes").limit(8).collect()
      val schema = spark.read.parquet(s"$vd/pq2_codes").schema
      spark.createDataFrame(java.util.Arrays.asList(half: _*), schema)
        .write.mode("overwrite").parquet(s"$vd/pq2_codes")
      // fresh JVM-side state: memos and the validation cache both cleared
      Similarity.clearMemos()
      AnnIndex.resetValidation()
      val err = intercept[Exception] {
        Similarity.annPq.run(spark, tmp).collect()
      }
      def rootMsg(t: Throwable): String =
        if (t.getCause == null) String.valueOf(t.getMessage)
        else rootMsg(t.getCause) + String.valueOf(t.getMessage)
      assert(rootMsg(err).contains("corrupt") || err.getMessage.contains("corrupt"),
        s"expected a corrupt-index failure, got: $err")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }

  private def ccDocsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("CC labels: fit once; append merges, joins and lowers cluster ids exactly as a fresh build") {
    import graft.operators.{AnnIndex, Dedup}
    val tmp = java.nio.file.Files.createTempDirectory("graftcc").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftccroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftccroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    val t = (1 to 16).map(i => f"tk$i%02d")
    val A = t.slice(0, 12).mkString(" ")  // cluster A template
    val B = t.slice(4, 16).mkString(" ")  // overlaps A at jaccard 6/14 < 0.5
    val C = t.slice(2, 14).mkString(" ")  // 8/12 ≈ 0.67 to BOTH — the bridge
    val filler15 = "filler doc unique15 with words alpha15 beta15 gamma15"
    val base = Seq(10L -> A, 11L -> A, 13L -> B, 14L -> B, 15L -> filler15) ++
      (16L to 20L).map(i =>
        i -> s"filler doc unique$i with words alpha$i beta$i gamma$i")
    def cid(out: Array[org.apache.spark.sql.Row], doc: Long): Long =
      out.find(_.getAs[Long]("doc_id") == doc).get.getAs[Long]("cluster_id")
    try {
      ccDocsDf(base).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.ccEncodes.get(), AnnIndex.ccAppends.get())
      val out1 = Dedup.clusters.run(spark, tmp).collect()
      assert(AnnIndex.ccEncodes.get() == e0 + 1)
      assert(cid(out1, 11L) == 10L && cid(out1, 14L) == 13L &&
        cid(out1, 10L) == 10L && cid(out1, 13L) == 13L,
        s"A and B must start as separate clusters: ${out1.mkString(",")}")
      Dedup.clusters.run(spark, tmp).collect()
      assert(AnnIndex.ccEncodes.get() == e0 + 1 &&
        AnnIndex.ccAppends.get() == a0, "second run must load, not rebuild")
      // ingest batch: a bridge text near-dup to BOTH templates (merges two
      // old components and, with the smallest doc id, becomes the merged
      // cluster id), an exact copy of an old filler (joins its component
      // and lowers its id), and a novel singleton
      val delta = Seq(2L -> C, 3L -> filler15,
        4L -> "totally novel appended text nothing shared here at all")
      ccDocsDf(delta).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out2 = Dedup.clusters.run(spark, tmp).collect()
      assert(AnnIndex.ccAppends.get() == a0 + 1 &&
        AnnIndex.ccEncodes.get() == e0 + 1,
        "a monotone append must take the delta path, never re-run CC on the corpus")
      assert(cid(out2, 10L) == 2L && cid(out2, 11L) == 2L &&
        cid(out2, 13L) == 2L && cid(out2, 14L) == 2L && cid(out2, 2L) == 2L,
        s"the bridge must merge A and B under the new min doc: ${out2.mkString(",")}")
      assert(cid(out2, 3L) == 3L && cid(out2, 15L) == 3L,
        "an exact copy with a smaller id must lower its component's cluster id")
      assert(cid(out2, 4L) == 4L)
      // the incremental labels ARE the from-scratch labels
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = Dedup.clusters.run(spark, tmp).collect()
      assert(AnnIndex.ccEncodes.get() == e0 + 2)
      assert(out2.map(_.toString).sorted.toSeq == fresh.map(_.toString).sorted.toSeq,
        "append-path components diverge from a fresh build")
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("CC labels: a shingle df crossing the cap forces a refit; output stays exact") {
    import graft.operators.{AnnIndex, Dedup}
    val tmp = java.nio.file.Files.createTempDirectory("graftccx").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftccxroot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftccxroot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    // 126 docs share one trigram (df=126 ≤ cap 128, edges still impossible:
    // inter=1 < 3); appending 5 more pushes df to 131 — old texts' capped-
    // shingle counts change, so the append is NOT structure-monotone
    def doc(i: Long) = i -> s"cshare1 cshare2 cshare3 tail${i}a tail${i}b tail${i}c"
    try {
      ccDocsDf((0L until 126L).map(doc)).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.ccEncodes.get(), AnnIndex.ccAppends.get())
      Dedup.clusters.run(spark, tmp).collect()
      assert(AnnIndex.ccEncodes.get() == e0 + 1)
      ccDocsDf((200L until 205L).map(doc)).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out = Dedup.clusters.run(spark, tmp).collect()
      assert(AnnIndex.ccEncodes.get() == e0 + 2 &&
        AnnIndex.ccAppends.get() == a0,
        "a df-cap crossing must refit, not append")
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = Dedup.clusters.run(spark, tmp).collect()
      assert(out.map(_.toString).sorted.toSeq == fresh.map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("NP pair graph: ngram dedup serves persisted pairs; appends are delta-only; df-cap crossing refits") {
    import graft.operators.{AnnIndex, Dedup}
    val tmp = java.nio.file.Files.createTempDirectory("graftnp").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftnproot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftnproot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    val t = (1 to 16).map(i => f"tk$i%02d")
    val X1 = t.slice(0, 12).mkString(" ")   // base template
    val X3 = t.slice(1, 13).mkString(" ")   // near-dup of X1 (9 shared shingles)
    val base = Seq(10L -> X1, 11L -> X1) ++ (12L to 18L).map(i =>
      i -> s"filler doc unique$i with words alpha$i beta$i gamma$i")
    try {
      ccDocsDf(base).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.npEncodes.get(), AnnIndex.npAppends.get())
      val out1 = Dedup.ngramJaccard.run(spark, tmp).collect()
      assert(AnnIndex.npEncodes.get() == e0 + 1)
      assert(out1.exists(r => r.getAs[Long]("doc_a") == 10L &&
        r.getAs[Long]("doc_b") == 11L), "exact-dup within-group pair missing")
      Dedup.ngramJaccard.run(spark, tmp).collect()
      assert(AnnIndex.npEncodes.get() == e0 + 1 &&
        AnnIndex.npAppends.get() == a0, "second run must serve, not re-join")
      // ingest batch: a near-dup of the base template (the cross-boundary
      // pair the append path must find), an exact dup of a filler (zero
      // new np rows — distinct content unchanged), a novel singleton
      val delta = Seq(2L -> X3, 3L -> base(2)._2,
        4L -> "totally novel appended text nothing shared here at all")
      ccDocsDf(delta).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val out2 = Dedup.ngramJaccard.run(spark, tmp).collect()
      assert(AnnIndex.npAppends.get() == a0 + 1 &&
        AnnIndex.npEncodes.get() == e0 + 1,
        "a monotone append must take the delta path, never re-join the corpus")
      assert(out2.exists(r => r.getAs[Long]("doc_a") == 2L &&
        r.getAs[Long]("doc_b") == 10L), s"cross-boundary near-dup pair missing")
      assert(out2.exists(r => r.getAs[Long]("doc_a") == 3L &&
        r.getAs[Long]("doc_b") == base(2)._1),
        "appended exact dup lost its within-group pair")
      // the served graph IS the from-scratch graph
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val fresh = Dedup.ngramJaccard.run(spark, tmp).collect()
      assert(AnnIndex.npEncodes.get() == e0 + 2)
      assert(out2.map(_.toString).sorted.toSeq ==
        fresh.map(_.toString).sorted.toSeq,
        "append-path pair graph diverges from a fresh build")
      // df-cap crossing: 126 docs share a trigram (df=126 <= 128);
      // 5 appended sharers push df to 131 — old texts' kept-shingle sets
      // change, the append is not structure-monotone, must refit
      spark.conf.set("graft.ann.indexRoot", idxRoot)
      val tmpx = java.nio.file.Files.createTempDirectory("graftnpx").toString
      def doc(i: Long) = i -> s"cshare1 cshare2 cshare3 tail${i}a tail${i}b tail${i}c"
      try {
        ccDocsDf((0L until 126L).map(doc)).repartition(1).write.mode("overwrite")
          .parquet(s"$tmpx/documents.parquet")
        val e1 = AnnIndex.npEncodes.get()
        Dedup.ngramJaccard.run(spark, tmpx).collect()
        assert(AnnIndex.npEncodes.get() == e1 + 1)
        ccDocsDf((200L until 205L).map(doc)).repartition(1).write.mode("append")
          .parquet(s"$tmpx/documents.parquet")
        val outx = Dedup.ngramJaccard.run(spark, tmpx).collect()
        assert(AnnIndex.npEncodes.get() == e1 + 2 &&
          AnnIndex.npAppends.get() == a0 + 1,
          "a df-cap crossing must refit, not append")
        spark.conf.set("graft.ann.indexRoot", freshRoot)
        val freshx = Dedup.ngramJaccard.run(spark, tmpx).collect()
        assert(outx.map(_.toString).sorted.toSeq ==
          freshx.map(_.toString).sorted.toSeq)
      } finally rmTree(tmpx)
      // dropped-shingle resurrection guard (the r11 full-df-table
      // invariant): a shingle ALREADY over the cap at fit (df=130) gains
      // two more sharers — no KEPT shingle crosses, so the delta path
      // must run, and the dropped shingle's delta-df (2 ≤ cap) must NOT
      // resurrect it: Y1/Y2 share it plus exactly 2 kept shingles, so a
      // resurrection would mint an inter=3 pair a fresh build never emits
      spark.conf.set("graft.ann.indexRoot", idxRoot)
      val tmpr = java.nio.file.Files.createTempDirectory("graftnpr").toString
      def rdoc(i: Long) = i -> s"cshare1 cshare2 cshare3 tail${i}a tail${i}b tail${i}c"
      try {
        ccDocsDf((0L until 130L).map(rdoc)).repartition(1).write.mode("overwrite")
          .parquet(s"$tmpr/documents.parquet")
        val (e2, a2) = (AnnIndex.npEncodes.get(), AnnIndex.npAppends.get())
        Dedup.ngramJaccard.run(spark, tmpr).collect()
        assert(AnnIndex.npEncodes.get() == e2 + 1)
        ccDocsDf(Seq(
          300L -> "cshare1 cshare2 cshare3 ynew1 ynew2 qone",
          301L -> "cshare1 cshare2 cshare3 ynew1 ynew2 qtwo"))
          .repartition(1).write.mode("append").parquet(s"$tmpr/documents.parquet")
        val outr = Dedup.ngramJaccard.run(spark, tmpr).collect()
        assert(AnnIndex.npAppends.get() == a2 + 1 &&
          AnnIndex.npEncodes.get() == e2 + 1,
          "an already-dropped shingle gaining sharers is monotone — must append")
        assert(!outr.exists(r => r.getAs[Long]("doc_a") == 300L &&
          r.getAs[Long]("doc_b") == 301L),
          "dropped shingle resurrected through the delta path (inter inflated to 3)")
        spark.conf.set("graft.ann.indexRoot", freshRoot)
        val freshr = Dedup.ngramJaccard.run(spark, tmpr).collect()
        assert(outr.map(_.toString).sorted.toSeq ==
          freshr.map(_.toString).sorted.toSeq,
          "resurrection-regime append diverges from a fresh build")
      } finally rmTree(tmpr)
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("MP/SP pair graphs: band and chunk collision joins serve persisted pairs; appends delta-only; cap crossing refits") {
    import graft.operators.{AnnIndex, Dedup}
    val tmp = java.nio.file.Files.createTempDirectory("grafttp").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("grafttproot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("grafttproot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    val t = (1 to 16).map(i => f"tk$i%02d")
    val X1 = t.slice(0, 12).mkString(" ")
    // a PERMUTATION of X1: distinct text, IDENTICAL simhash (the vote is
    // order-invariant) — chunk collision and hamming 0 by construction
    val X3 = t.slice(0, 12).reverse.mkString(" ")
    val base = Seq(10L -> X1, 11L -> X1) ++ (12L to 18L).map(i =>
      i -> s"filler doc unique$i with words alpha$i beta$i gamma$i")
    try {
      ccDocsDf(base).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.tpEncodes.get(), AnnIndex.tpAppends.get())
      Dedup.minhashLsh.run(spark, tmp).collect()
      Dedup.simhash.run(spark, tmp).collect()
      assert(AnnIndex.tpEncodes.get() == e0 + 2, "one MP + one SP build")
      Dedup.minhashLsh.run(spark, tmp).collect()
      Dedup.simhash.run(spark, tmp).collect()
      assert(AnnIndex.tpEncodes.get() == e0 + 2 &&
        AnnIndex.tpAppends.get() == a0, "second runs must serve, not re-join")
      val delta = Seq(2L -> X3,
        4L -> "totally novel appended text nothing shared here at all")
      ccDocsDf(delta).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      val mh2 = Dedup.minhashLsh.run(spark, tmp).collect()
      val sh2 = Dedup.simhash.run(spark, tmp).collect()
      assert(AnnIndex.tpAppends.get() == a0 + 2 &&
        AnnIndex.tpEncodes.get() == e0 + 2,
        "a monotone append must take the delta path on both families")
      assert(sh2.exists(r => r.getAs[Long]("doc_a") == 2L &&
        r.getAs[Long]("doc_b") == 10L && r.getAs[Long]("hamming") <= 12L),
        s"cross-boundary simhash near-dup pair missing")
      // served graphs equal fresh builds
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      val mhF = Dedup.minhashLsh.run(spark, tmp).collect()
      val shF = Dedup.simhash.run(spark, tmp).collect()
      assert(mh2.map(_.toString).sorted.toSeq == mhF.map(_.toString).sorted.toSeq,
        "MP append-path graph diverges from a fresh build")
      assert(sh2.map(_.toString).sorted.toSeq == shF.map(_.toString).sorted.toSeq,
        "SP append-path graph diverges from a fresh build")
      // cap crossing: simhash is ORDER-INVARIANT (distinct-token vote),
      // so 64 permutations of one token set are 64 DISTINCT texts with
      // IDENTICAL signatures — every chunk bucket holds exactly 64
      // members (the cap); a 65th permutation crosses it — refit
      spark.conf.set("graft.ann.indexRoot", idxRoot)
      val tmpx = java.nio.file.Files.createTempDirectory("grafttpx").toString
      val perms = t.permutations.take(65).map(_.mkString(" ")).toSeq
      try {
        ccDocsDf((0 until 64).map(i => i.toLong -> perms(i)))
          .repartition(1).write.mode("overwrite")
          .parquet(s"$tmpx/documents.parquet")
        val e1 = AnnIndex.tpEncodes.get()
        Dedup.simhash.run(spark, tmpx).collect()
        assert(AnnIndex.tpEncodes.get() == e1 + 1)
        ccDocsDf(Seq(200L -> perms(64))).repartition(1).write.mode("append")
          .parquet(s"$tmpx/documents.parquet")
        val outx = Dedup.simhash.run(spark, tmpx).collect()
        assert(AnnIndex.tpEncodes.get() == e1 + 2,
          "a bucket-cap crossing must refit, not append")
        spark.conf.set("graft.ann.indexRoot", freshRoot)
        val freshx = Dedup.simhash.run(spark, tmpx).collect()
        assert(outx.map(_.toString).sorted.toSeq ==
          freshx.map(_.toString).sorted.toSeq)
      } finally rmTree(tmpx)
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("BPE vocabulary: tokenize once, delta-only exact append; merges match a fresh build; truncation refuses") {
    import graft.operators.Bpe
    val tmp = java.nio.file.Files.createTempDirectory("graftbpe").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftbperoot").toString
    val freshRoot = java.nio.file.Files.createTempDirectory("graftbperoot2").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val base = (0L until 30L).map(i =>
      i -> s"low lower newest widest common${i % 4} word$i")
    try {
      docsDf(base).repartition(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val (e0, a0) = (AnnIndex.vocabEncodes.get(), AnnIndex.vocabAppends.get())
      Bpe.resetMemo()
      val m1 = Bpe.trainMerges(spark, tmp, 8)
      assert(AnnIndex.vocabEncodes.get() == e0 + 1)
      Bpe.resetMemo() // "session restart": the in-JVM merge memo is gone
      val m1b = Bpe.trainMerges(spark, tmp, 8)
      assert(AnnIndex.vocabEncodes.get() == e0 + 1 &&
        AnnIndex.vocabAppends.get() == a0,
        "second run must load the persisted vocabulary, not re-tokenize")
      assert(m1b == m1)
      // ingest batch: pure file append → tokenize the DELTA only, counts
      // sum exactly into a self-contained merged vocabulary
      val delta = (100L until 110L).map(i =>
        i -> s"low lower appended body extra$i common${i % 4}")
      docsDf(delta).repartition(1).write.mode("append")
        .parquet(s"$tmp/documents.parquet")
      Bpe.resetMemo()
      val m2 = Bpe.trainMerges(spark, tmp, 8)
      assert(AnnIndex.vocabAppends.get() == a0 + 1 &&
        AnnIndex.vocabEncodes.get() == e0 + 1,
        "append must tokenize the batch only, never the corpus")
      val chainedWf = AnnIndex.bpeVocab(spark, tmp)._1.collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      // exact mergeability: the appended vocabulary and the merge table
      // are bit-identical to a from-scratch build of the grown corpus
      spark.conf.set("graft.ann.indexRoot", freshRoot)
      Bpe.resetMemo()
      val m2fresh = Bpe.trainMerges(spark, tmp, 8)
      assert(AnnIndex.vocabEncodes.get() == e0 + 2)
      assert(m2 == m2fresh, "appended merge table diverges from fresh build")
      val freshWf = AnnIndex.bpeVocab(spark, tmp)._1.collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(chainedWf == freshWf, "appended vocabulary diverges from fresh build")
      // tampering/corruption: a vocabulary whose token mass drifts from
      // the version key must fail loud, not train a wrong tokenizer
      spark.conf.set("graft.ann.indexRoot", idxRoot)
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val tip = tableDir.listFiles().filter(_.isDirectory)
        .find(d => new java.io.File(d, "_GRAFT_OK_BPE").exists()).get
      Seq(("zzz_bogus", 999L)).toDF("w", "freq")
        .write.mode("append").parquet(s"$tip/bpe_wf")
      AnnIndex.resetValidation()
      Bpe.resetMemo()
      intercept[IllegalStateException] { Bpe.trainMerges(spark, tmp, 8) }
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot); rmTree(freshRoot)
    }
  }

  test("GC sweep: superseded version dirs die on the maintenance cadence; live chains and usable append bases survive (verdict r13 #7)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftswp").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("graftswproot").toString
    spark.conf.set("graft.ann.indexRoot", idxRoot)
    try {
      // v1: LSH2 (chained family) + EHM (self-contained) complete in dir1
      writeVecs(tmp, 0, n = 64)
      Similarity.annLsh.run(spark, tmp).collect()
      val tableDir = new java.io.File(idxRoot).listFiles().head
      val v1 = tableDir.listFiles().map(_.getName).toSet
      assert(v1.size == 1)
      // REWRITE -> v2: rebuild ONLY EHM. Build-time prune must keep dir1
      // (the lagging LSH2's keep-forever rule, the r11 orphaning fix) --
      // which is exactly the accumulation the sweep exists to close.
      writeVecs(tmp, 3, n = 64)
      Similarity.clearMemos()
      AnnIndex.vecHashes(spark, tmp).count()
      assert(tableDir.listFiles().length == 2,
        "build-time prune must keep the lagging family's dir")
      // sweep: dir1's recorded inventory no longer subsets the rewritten
      // table -- it can never serve or seed an append again; dir2 holds
      // the live EHM version and must survive
      assert(AnnIndex.sweepVersions(spark, s"$tmp/embeddings.parquet") == 1,
        "the unusable superseded dir must be deleted")
      val left = tableDir.listFiles().map(_.getName).toSet
      assert(left.size == 1 && (left & v1).isEmpty)
      val (e0, a0) = (AnnIndex.ehmEncodes.get(), AnnIndex.ehmAppends.get())
      assert(AnnIndex.vecHashes(spark, tmp).count() == 64L)
      assert(AnnIndex.ehmEncodes.get() == e0 && AnnIndex.ehmAppends.get() == a0,
        "a sweep must never invalidate the live version: serve = pure load")
      // pure file APPEND -> v3 pending: BEFORE any build lands at v3 the
      // sweep must keep dir2, the usable append base (inventory subset of
      // the current files) -- deleting it would force a full re-encode
      appendVecs(tmp, 64 until 80, seed = 3)
      assert(AnnIndex.sweepVersions(spark, s"$tmp/embeddings.parquet") == 0,
        "a usable append base was deleted")
      AnnIndex.vecHashes(spark, tmp).count()
      assert(AnnIndex.ehmAppends.get() == a0 + 1,
        "the surviving base must serve the append as a delta encode")
      // with EHM now complete at v3 (self-contained), dir2 is genuinely
      // superseded -- reclaimed by the build-time prune or the sweep;
      // either way exactly the live version remains and the tip still
      // serves with zero re-encode
      AnnIndex.sweepVersions(spark, s"$tmp/embeddings.parquet")
      assert(tableDir.listFiles().length == 1)
      val (e1, a1) = (AnnIndex.ehmEncodes.get(), AnnIndex.ehmAppends.get())
      assert(AnnIndex.vecHashes(spark, tmp).count() == 80L)
      assert(AnnIndex.ehmEncodes.get() == e1 && AnnIndex.ehmAppends.get() == a1)
    } finally {
      spark.conf.unset("graft.ann.indexRoot")
      rmTree(tmp); rmTree(idxRoot)
    }
  }
}

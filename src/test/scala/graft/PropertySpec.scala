package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Text, Vectors}

/** Generated-input pins for the invariants the oracle hash-matching and
  * the reference fidelity rest on. Cases are generated with scalacheck
  * Gens (fixed seeds — deterministic across runs) and evaluated in one
  * DataFrame pass per property, not one Spark job per sample.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("fix_title backstop: a non-blank title never normalizes to blank") {
    // adversarial inputs: strings the 9 steps can fully consume
    val gen = for {
      core <- Gen.oneOf("(live)", "[full album]", "【complete】", "2021",
        "ost", "OST", ":", "|", "-", "( )", "[2020]", "full album",
        "x", "song (2021)", " a - b - c ")
      pre  <- Gen.oneOf("", "(", "【", " ")
      post <- Gen.oneOf("", ")", "】", " ", " OST")
    } yield s"$pre$core$post"
    val titles = sample(gen, 400).filter(_.trim.nonEmpty)
    val out = Text.withFixedTitle(titles.toDF("title"), col("title"))
    val blank = out.where(trim(col("fixed_title")) === "").count()
    assert(blank == 0, "backstop must reset an emptied title to the original")
  }

  test("Num.cents is exact on the cent grid") {
    // money arrives as k/100.0 doubles; cents() must recover k exactly —
    // the property every price_cents oracle column relies on
    val ks = sample(Gen.chooseNum(-4000000000000L, 4000000000000L), 500)
    val out = ks.toDF("k")
      .select(col("k"), Num.cents(col("k").cast("double") / 100.0).as("c"))
      .where(col("k") =!= col("c"))
    assert(out.count() == 0)
  }

  test("iso8601Ms equals the component sum for any PTnHnMnS combination") {
    val gen = for {
      h <- Gen.option(Gen.chooseNum(0L, 99L))
      m <- Gen.option(Gen.chooseNum(0L, 300L))
      s <- Gen.option(Gen.chooseNum(0L, 300L))
      if h.isDefined || m.isDefined || s.isDefined
    } yield (h, m, s)
    val cases = sample(gen, 300).map { case (h, m, s) =>
      val str = "PT" + h.map(_ + "H").getOrElse("") +
        m.map(_ + "M").getOrElse("") + s.map(_ + "S").getOrElse("")
      val ms = h.getOrElse(0L) * 3600000L + m.getOrElse(0L) * 60000L +
        s.getOrElse(0L) * 1000L
      (str, ms)
    }
    val out = cases.toDF("dur", "want")
      .select(col("want"), Text.iso8601Ms(col("dur")).as("got"))
      .where(col("want") =!= col("got"))
    assert(out.count() == 0)
  }

  test("dag topological order respects every dependency on generated DAGs") {
    import graft.pipeline.{Dag, Stage}
    // random acyclic graphs: node i may only depend on nodes j < i, then
    // the declaration order is shuffled so `order` has real work to do
    val dagGen = for {
      n <- Gen.chooseNum(1, 12)
      deps <- Gen.sequence[Seq[Seq[Int]], Seq[Int]]((0 until n).map(i =>
        if (i == 0) Gen.const(Seq.empty[Int])
        else Gen.someOf(0 until i).map(_.toSeq)))
      perm <- Gen.const(scala.util.Random.javaRandomToRandom(
        new java.util.Random(n.toLong)).shuffle((0 until n).toList))
    } yield perm.map(i => Stage(s"s$i", deps(i).map(j => s"s$j"),
      s => s.range(1).toDF()))
    for (stages <- sample(dagGen, 40)) {
      val order = new Dag(stages).order
      val pos = order.zipWithIndex.toMap
      assert(order.sorted == stages.map(_.name).sorted)
      for (st <- stages; dep <- st.deps)
        assert(pos(dep) < pos(st.name),
          s"${st.name} ran before its dependency $dep in $order")
    }
  }

  test("media container walkers never throw and emit ascending in-bounds offsets on arbitrary bytes") {
    // the frame walkers run inside per-partition tasks over UNTRUSTED
    // crawl payloads: any byte stream must yield a (possibly empty)
    // frame list — never an exception, an out-of-bounds offset, or a
    // non-terminating walk. Fuzzed over random buffers, random buffers
    // behind each container's valid magic, and every truncation of the
    // magic itself. Driver-side: the kernels are plain functions.
    import graft.operators.Multimodal
    val genBytes = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
    val bufs = sample(genBytes, 300).map(_.toArray)
    val gifMagic = "GIF89a".getBytes("US-ASCII")
    val pngMagic = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val all = bufs ++ bufs.map(gifMagic ++ _) ++ bufs.map(pngMagic ++ _) ++
      (0 to 8).map(pngMagic.take) ++ (0 to 6).map(gifMagic.take)
    for (b <- all; fs <- Seq(Multimodal.gifFrames(b), Multimodal.apngFrames(b))) {
      assert(fs.map(_._1) == fs.map(_._1).sorted, "offsets must ascend")
      fs.foreach { case (off, _, _) =>
        assert(off >= 0 && off < b.length, s"offset $off out of ${b.length}")
      }
    }
  }

  test("capBuckets: the semi-join device equals the count-over-window formulation on skewed keys") {
    // the r9 rewrite's semantic pin: groupBy + LEFT SEMI back must keep
    // EXACTLY the rows the one-pass window filter kept, for any key
    // distribution and cap — generated with a deliberately skewed key
    // mix (a few mass keys + a long tail) including duplicate rows
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      k <- Gen.frequency((8, Gen.chooseNum(0, 3)), (2, Gen.chooseNum(4, 40)))
      p <- Gen.chooseNum(0, 1000)
    } yield (k.toLong, p.toLong)
    val df = sample(gen, 800).toDF("k", "p")
    for (cap <- Seq(1, 5, 64)) {
      val got = graft.operators.Dedup.capBuckets(df, Seq("k"), cap)
        .select("k", "p").as[(Long, Long)].collect().toSeq.sorted
      val want = df
        .withColumn("bsz", count(lit(1)).over(Window.partitionBy("k")))
        .where(col("bsz") <= cap)
        .select("k", "p").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"cap=$cap: semi-join device diverges from window filter")
    }
  }

  test("multi-probe LSH solver: boundary recall target met at every corpus size") {
    // The r4 scheme clamped the solved band count to the cost cap, so
    // expected boundary recall silently fell below target past n ≈ 4k.
    // lshParams escalates the probe radius instead; this sweep proves the
    // recall equation holds UN-clamped for every n up to 2^62 at both
    // design points — the clamp is dead code, not a cliff.
    val designPoints = Seq(
      (operators.Similarity.dedupTau, 0.02, 96), // q_dedup_embed
      (0.3, 0.1, 64))                            // q_ann_lsh
    val ns = (6 to 62).map(1L << _) ++
      sample(Gen.chooseNum(64L, Long.MaxValue / 4), 100)
    for ((tau, miss, cap) <- designPoints; n <- ns) {
      val (bits, bands, radius) = operators.Similarity.lshParams(n, tau, miss, cap)
      assert(bits >= 2 && bits <= 16 && radius >= 0 && radius <= 3)
      assert(bands >= 4 && bands <= cap)
      val p = 1.0 - math.acos(tau) / math.Pi
      val pb = operators.Similarity.bandMatchProb(bits, radius, p)
      val recall = 1.0 - math.pow(1.0 - pb, bands)
      assert(recall >= 1.0 - miss - 1e-9,
        s"n=$n tau=$tau: boundary recall $recall < ${1.0 - miss} " +
          s"(bits=$bits bands=$bands radius=$radius)")
      // the probe ring stays bounded: ≤ 697 masks at bits=16, radius=3
      assert(operators.Similarity.probeMasks(bits, radius).length <= 697)
    }
  }

  test("hyperplaneBands: deterministic, band count and code range as declared") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0))
    val vecs = sample(vecGen, 200).map(v => Tuple1(v))
    val df = vecs.toDF("v")
      .select(Vectors.hyperplaneBands(col("v"), 42L, 6, 5).as("sig"),
        Vectors.hyperplaneBands(col("v"), 42L, 6, 5).as("sig2"))
    val bad = df.where(
      size(col("sig")) =!= 6 ||
        exists(col("sig"), c => c < 0 || c >= (1 << 5)) ||
        !(col("sig") === col("sig2")))
    assert(bad.count() == 0)
  }

  test("split-ball masks + popcount-sum predicate cover the hamming ball exactly once") {
    // exhaustive over every code difference d: a pair at hamming distance
    // popcount(d) must be found by exactly ONE (low-mask, high-mask)
    // combination when popcount(d) ≤ radius, and by none otherwise —
    // i.e. the split-ball join emits the same candidate set as the
    // one-sided ring, once per matching band, never duplicated
    for (bits <- Seq(4, 7, 11, 16); radius <- 0 to 3) {
      val (lo, hi) = graft.operators.Similarity.splitProbeMasks(bits, radius)
      val counts = scala.collection.mutable.Map.empty[Long, Int]
      for (a <- lo; b <- hi
           if java.lang.Long.bitCount(a) + java.lang.Long.bitCount(b) <= radius)
        counts.updateWith(a ^ b)(c => Some(c.getOrElse(0) + 1))
      for (d <- 0L until (1L << bits)) {
        val expect = if (java.lang.Long.bitCount(d) <= radius) 1 else 0
        assert(counts.getOrElse(d, 0) == expect,
          s"bits=$bits radius=$radius d=$d seen=${counts.getOrElse(d, 0)} want=$expect")
      }
    }
  }

  test("PQ kernels match an independent local reference bit-exactly") {
    // encode / lut / adc evaluated through the DataFrame (codegen path)
    // vs plain-loop re-implementations here: field packing, L2 argmin
    // tie-breaks (strictly-less ⇒ smallest index), and the subspace-
    // grouped ADC summation order must all agree, or the operator's
    // ranking silently drifts from its documented semantics
    val m = 8; val ksub = 16; val dim = 64; val dsub = dim / m
    val rnd = new scala.util.Random(42)
    val cents = Array.fill(m * ksub * dsub)(rnd.nextDouble() - 0.5)
    val vecs = (0 until 48).map(i => i.toLong -> Array.fill(dim)(rnd.nextDouble() - 0.5))
    val query = Array.fill(dim)(rnd.nextDouble() - 0.5)

    def refEncode(v: Array[Double]): Long = {
      var code = 0L
      for (s <- 0 until m) {
        var bestJ = 0; var best = Double.PositiveInfinity
        for (j <- 0 until ksub) {
          var d2 = 0.0
          for (d <- 0 until dsub) {
            val diff = v(s * dsub + d) - cents((s * ksub + j) * dsub + d)
            d2 += diff * diff
          }
          if (d2 < best) { best = d2; bestJ = j }
        }
        code |= bestJ.toLong << (8 * s)
      }
      code
    }
    def refLut(q: Array[Double]): Array[Double] =
      Array.tabulate(m * ksub) { i =>
        val s = i / ksub; val j = i % ksub
        var dot = 0.0
        for (d <- 0 until dsub)
          dot += q(s * dsub + d) * cents((s * ksub + j) * dsub + d)
        dot
      }
    val lutRef = refLut(query)
    def refAdc(code: Long): Double = {
      var sum = 0.0
      for (s <- 0 until m) sum += lutRef(s * ksub + ((code >>> (8 * s)) & 0xFFL).toInt)
      sum
    }

    val qlut = Vectors.pqLut(
      lit(query.map(java.lang.Double.valueOf)).cast("array<double>"), cents, m, ksub)
    val out = vecs.toDF("id", "v")
      .select(col("id"), Vectors.pqEncode(col("v"), cents, m, ksub).as("code"),
        qlut.as("lut"))
      .select(col("id"), col("code"), col("lut"),
        Vectors.pqAdc(col("code"), col("lut"), m).as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))

    for ((id, code, lutGot, adc) <- out) {
      val v = vecs(id.toInt)._2
      assert(code == refEncode(v), s"encode mismatch for vector $id")
      for (s <- 0 until m)
        assert(((code >>> (8 * s)) & 0xFFL) < ksub, s"field $s out of range")
      assert(lutGot.sameElements(lutRef), "lut mismatch")
      assert(adc == refAdc(code), s"adc mismatch for vector $id")
    }
  }

  test("lm score: linear-mean junk-tail ranking agrees with log-perplexity on a planted corpus") {
    // q_lm_score emits the LINEAR mean of conditional probabilities (the
    // hash-gate-exact choice); the filter's consumer semantics are
    // log-space (CCNet thresholds perplexity = -mean log P). Assert the
    // two rankings agree on what matters — which documents are the junk
    // tail — on a planted fluent/scrambled corpus, with the log side
    // recomputed independently from local bigram counts.
    val fluent1 = "the cat sat on the mat"
    val fluent2 = "a dog ran in the park"
    val docs = Seq(
      1L -> fluent1, 2L -> fluent1, 3L -> fluent1,
      4L -> fluent2, 5L -> fluent2, 6L -> fluent2,
      7L -> "mat the on sat cat the", // scrambles: same vocabulary,
      8L -> "park a in ran dog the")  // bigrams no other doc has
    val junk = Set(7L, 8L)
    val tmp = java.nio.file.Files.createTempDirectory("graftlmord").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val linear = operators.TextAnalysis.lmScore.run(spark, tmp)
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap

    // independent local model: same whitespace tokens, same corpus counts
    val toks = docs.map { case (id, t) => id -> t.trim.split(" +").toSeq }
    val uc = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val bc = toks.flatMap(_._2.sliding(2).map(_.mkString(" ")).toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    val meanLog = toks.map { case (id, ws) =>
      val rs = ws.sliding(2).toSeq.map(p =>
        bc(p.mkString(" ")).toDouble / uc(p.head).toDouble)
      id -> rs.map(math.log).sum / rs.size
    }.toMap

    val tailByLinear = linear.toSeq.sortBy(_._2).take(junk.size).map(_._1).toSet
    val tailByLog = meanLog.toSeq.sortBy(_._2).take(junk.size).map(_._1).toSet
    assert(tailByLinear == junk, s"linear tail $tailByLinear != planted junk")
    assert(tailByLog == junk, s"log tail $tailByLog != planted junk")
    // every junk doc scores strictly below every fluent doc on BOTH axes
    for (j <- junk; f <- linear.keySet -- junk) {
      assert(linear(j) < linear(f), s"linear: junk $j not below fluent $f")
      assert(meanLog(j) < meanLog(f), s"log: junk $j not below fluent $f")
    }

    // Where the two CAN diverge (documented, pure arithmetic): the linear
    // mean is dominated by the largest ratio, the log mean by the
    // smallest — one corpus-common bigram among rare ones can outrank a
    // uniformly-mediocre doc linearly while losing in log space. The
    // filter's tail decision is robust to this only when junk is junk on
    // every position (the planted shape above); borderline docs near the
    // threshold can reorder.
    val spiky = Seq(1.0, 0.01, 0.01)
    val uniform = Seq(0.2, 0.2, 0.2)
    assert(spiky.sum / 3 > uniform.sum / 3 &&
      spiky.map(math.log).sum / 3 < uniform.map(math.log).sum / 3,
      "divergence example no longer diverges")
  }

  test("bm25: ratio-idf ranking agrees with log-idf BM25 on a planted corpus") {
    // q_bm25 keeps the Robertson idf UN-LOGGED ((N−df+0.5)/(df+0.5), the
    // hash-gate-exact choice); real BM25 logs it. Per term the map is
    // monotone, so single-term rankings can't differ — assert the
    // multi-term ranking also agrees on a planted relevance ladder, with
    // the log side recomputed independently, then demonstrate the one
    // shape where the sums CAN reorder.
    val docs = Seq(
      0L -> "alpha beta",                      // the query (doc_id < 5)
      1L -> "zz", 2L -> "zz", 3L -> "zz", 4L -> "zz", // inert query slots
      10L -> "alpha beta common pad1",         // both query terms
      11L -> "alpha common pad2 pad3",         // one query term
      12L -> "common pad4 pad5 pad6",          // no query term — must not appear
      13L -> "common pad7", 14L -> "common pad8", 15L -> "common pad9")
    val tmp = java.nio.file.Files.createTempDirectory("graftbm25").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = operators.TextAnalysis.bm25.run(spark, tmp)
      .where($"query_id" === 0L)
      .select("doc_id", "score", "rn").as[(Long, Double, Long)].collect()
    val ranked = out.sortBy(_._3).map(_._1).toSeq
    assert(ranked == Seq(10L, 11L),
      s"expected the two-term doc above the one-term doc and nothing else, got $ranked")

    // independent log-idf BM25 over the same counts
    val toks = docs.map { case (id, t) => id -> t.trim.split(" +").toSeq }
    val n = toks.size
    val dfm = toks.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    def logBm25(q: Seq[String], dws: Seq[String]): Double =
      q.distinct.filter(dws.contains).map { t =>
        val tf = dws.count(_ == t).toDouble
        val dl = dws.size.toDouble
        math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * (dl / avgdl)))
      }.sum
    val q0 = toks.toMap.apply(0L)
    val byLog = Seq(10L, 11L).sortBy(id => -logBm25(q0, toks.toMap.apply(id)))
    assert(byLog == Seq(10L, 11L), s"log-idf ranking diverged: $byLog")

    // Where the sums CAN reorder (documented, pure arithmetic): the
    // un-logged idf of one df=1 term can outweigh several moderate-df
    // terms linearly while losing after the log damps it — N=100, one
    // rare term (idf 99.5/1.5) vs three df=12 terms (idf 88.5/12.5 each):
    val rareLinear = 99.5 / 1.5
    val threeModerateLinear = 3 * (88.5 / 12.5)
    assert(rareLinear > threeModerateLinear &&
      math.log(99.5 / 1.5) < 3 * math.log(88.5 / 12.5),
      "divergence example no longer diverges")
  }
}

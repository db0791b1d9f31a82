package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.T
import graft.functions.Vectors

/** Session-lifetime memo of derived frames, fingerprint-validated.
  *
  * The r11 bench's largest remaining avoidable cost was the per-query
  * re-derivation of the id↔content-hash member mappings: every
  * signature-serving query (the dedup family, bm25/phrase retrieval,
  * DSIR/winnow, the tokenizer-apply family, the embedding serves) opened
  * the corpus, hashed every text/vector, and re-grouped — ~27 consumers
  * × a full corpus scan each, ~118 s of the 615 s 100× run, for a value
  * that is a pure function of the table content. This is the found-on-try
  * memo device (EltOps r11) generalized: the reference pipeline lands
  * such mappings ONCE per run as a table and every downstream model reads
  * that table (dbt's materialized staging layer), so the engine mirrors
  * that — one persisted materialization per (session, dataset, family),
  * every consumer shares it.
  *
  * Validity: entries are keyed by (session identity, dataset dir, family)
  * and carry the [[Similarity.tableFingerprint]] of every source table
  * the build reads (path + length + mtime of each physical file — a pure
  * namenode metadata listing, no data read). A lookup whose current
  * fingerprint differs rebuilds and unpersists the stale frames, so an
  * in-session append or in-place rewrite is served fresh — the same
  * retrain-on-rewrite contract the Bpe/IVF memos pin (ADVICE r11 flagged
  * the found-on-try memo for lacking exactly this check; it now routes
  * through here).
  *
  * Memory: frames persist MEMORY_AND_DISK (spill, never OOM) and are
  * deliberately NOT CacheBag-tracked — CacheBag releases per query and
  * the whole point is cross-query reuse. Entries of stopped sessions are
  * evicted on the next build; a live session's entries are bounded by
  * (#datasets × #families) narrow frames, each O(corpus ids), not
  * O(corpus text).
  */
object SessionMemo {
  private final case class Entry(session: SparkSession, fp: Long,
      frames: Seq[DataFrame])
  private val cache = scala.collection.mutable.HashMap.empty[String, Entry]

  /** Per-family build (memo miss) counters — Bench folds the sum into its
    * cold/warm attribution so the one pass paying a build is flagged, and
    * specs prove one-derivation-per-session with them.
    */
  private val buildCounters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  private[graft] def buildsOf(family: String): Long = {
    val c = buildCounters.get(family); if (c == null) 0L else c.get()
  }

  private[graft] def totalBuilds(): Long = {
    var t = 0L
    buildCounters.forEach((_, v) => t += v.get())
    t
  }

  /** Fetch (building if absent or stale) the memoized frames for
    * (session, dataset, family). `tables` are the dataset-relative source
    * tables the build reads — their combined physical fingerprint gates
    * staleness. The lock is held across the build: builds are
    * driver-cheap (plan construction + persist marking — no job runs
    * until a consumer acts), and re-entrant families (a memo built from
    * another memo) rely on the monitor's re-entrancy.
    */
  /** Stable per-session key segment: a UUID minted once per live session
    * (identityHashCode is NOT unique — two live sessions colliding on it
    * would be served frames bound to the other's SparkContext; ADVICE
    * r12). Keyed weakly so a collected session doesn't pin the map entry.
    */
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  private def sessionKey(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  private[graft] def frames(s: SparkSession, d: String, family: String,
      tables: Seq[String])(build: => Seq[DataFrame]): Seq[DataFrame] = {
    val key = s"${sessionKey(s)}#$d#$family"
    val fp = tables.foldLeft(family.hashCode.toLong) { (h, t) =>
      h * 1000003L + Similarity.tableFingerprint(s, s"$d/$t")
    }
    synchronized {
      // stopped-session hygiene: their persisted blocks are already gone
      // with the context; drop the dangling entries
      cache.filterInPlace((_, e) => !e.session.sparkContext.isStopped)
      cache.get(key) match {
        // the UUID key makes a cross-session hit impossible; the `eq`
        // check is belt-and-braces for the same-key-same-session claim
        case Some(e) if e.fp == fp && (e.session eq s) => e.frames
        case old =>
          old.foreach(_.frames.foreach { f =>
            try f.unpersist(blocking = false) catch { case _: Throwable => () }
          })
          buildCounters
            .computeIfAbsent(family, _ => new java.util.concurrent.atomic.AtomicLong(0))
            .incrementAndGet()
          // Eagerly persist + materialize the cached blocks (one count
          // job per build, once per session) — left lazy, consumers that
          // touch the frame only through BroadcastExchange collects and
          // shuffle-exchange subtrees re-compute the cached plan on
          // EVERY serve instead of populating the block store (measured
          // r13: q_dedup_contain re-ran the thg groupBy ~7x per run,
          // ~55 task-sec of repeated work per pass, until some pass
          // finally stored the blocks; with the eager count the first
          // consumer reads warm InMemoryTableScan rows like every later
          // one). The build is once per (session, dataset, family), so
          // this prices no per-serve job — the expansion-guard contract.
          // A frame the BUILDER already persisted is trusted as already
          // materialized (martTable must count before unpersisting its
          // build-scoped input) — re-persisting and re-counting it here
          // ran one redundant count job per session and polluted Bench's
          // cold-pass attribution (ADVICE r14).
          val built = build.map { f =>
            if (f.storageLevel == StorageLevel.NONE) {
              val p = f.persist(StorageLevel.MEMORY_AND_DISK)
              p.count(); p
            } else f
          }
          cache.update(key, Entry(s, fp, built))
          built
      }
    }
  }

  /** Drop every memoized entry (handles, frames, scalars) for `d` — the
    * maintenance hook for operations that change an artifact's FILE
    * layout without changing the source table's fingerprint (chain
    * compaction, r13): a memoized chain reader would otherwise keep
    * referencing pruned segment files for the rest of the session.
    */
  private[graft] def evictDataset(d: String): Unit = synchronized {
    val tag = s"#$d#"
    handles.filterInPlace((k, _) => !k.contains(tag))
    scalars.filterInPlace((k, _) => !k.contains(tag))
    cache.filterInPlace { (k, e) =>
      val drop = k.contains(tag)
      if (drop) e.frames.foreach { f =>
        try f.unpersist(blocking = false) catch { case _: Throwable => () }
      }
      !drop
    }
  }

  private final case class HandleEntry(session: SparkSession, fp: Long,
      frame: DataFrame)
  private val handles =
    scala.collection.mutable.HashMap.empty[String, HandleEntry]

  /** The unpersisted twin of [[frames]]: memoize a DataFrame HANDLE —
    * typically a persisted-artifact chain reader — without occupying
    * executor storage (r13, verdict r12 #5: the corpus-sized member
    * mappings now live as fingerprint-keyed parquet families, so the
    * memo's job shrinks to "resolve the artifact version once per
    * session", a count + validation the first consumer pays; every later
    * consumer reuses the resolved reader with only a metadata fingerprint
    * check). Same staleness contract as [[frames]]; builds count into the
    * same per-family counters.
    */
  private[graft] def handle(s: SparkSession, d: String, family: String,
      tables: Seq[String])(build: => DataFrame): DataFrame = {
    val key = s"${sessionKey(s)}#$d#$family"
    val fp = tables.foldLeft(family.hashCode.toLong) { (h, t) =>
      h * 1000003L + Similarity.tableFingerprint(s, s"$d/$t")
    }
    synchronized {
      handles.filterInPlace((_, e) => !e.session.sparkContext.isStopped)
      handles.get(key) match {
        case Some(e) if e.fp == fp && (e.session eq s) => e.frame
        case _ =>
          buildCounters
            .computeIfAbsent(family, _ => new java.util.concurrent.atomic.AtomicLong(0))
            .incrementAndGet()
          val f = build
          handles.update(key, HandleEntry(s, fp, f))
          f
      }
    }
  }

  private final case class ScalarEntry(session: SparkSession, fp: Long,
      value: Long)
  private val scalars =
    scala.collection.mutable.HashMap.empty[String, ScalarEntry]

  /** The scalar twin of [[frames]]: memoize one driver-side Long per
    * (session, dataset, family), fingerprint-validated the same way.
    * Used for pure-function-of-content aggregates a consumer needs per
    * serve but must not price as a per-serve job (the expansion budget
    * guard's Σ n_a·n_b — r13). Builds count into the same per-family
    * counters, so Bench's cold attribution flags the one pass that paid.
    */
  private[graft] def scalar(s: SparkSession, d: String, family: String,
      tables: Seq[String])(compute: => Long): Long = {
    val key = s"${sessionKey(s)}#$d#$family"
    val fp = tables.foldLeft(family.hashCode.toLong) { (h, t) =>
      h * 1000003L + Similarity.tableFingerprint(s, s"$d/$t")
    }
    synchronized {
      scalars.filterInPlace((_, e) => !e.session.sparkContext.isStopped)
      scalars.get(key) match {
        case Some(e) if e.fp == fp && (e.session eq s) => e.value
        case _ =>
          buildCounters
            .computeIfAbsent(family, _ => new java.util.concurrent.atomic.AtomicLong(0))
            .incrementAndGet()
          val v = compute
          scalars.update(key, ScalarEntry(s, fp, v))
          v
      }
    }
  }
}

/** The shared id↔content member mappings — one corpus hash pass per
  * (session, table content), every signature-serving query reads the
  * persisted result (see [[SessionMemo]]).
  */
object Members {

  /** (doc_id, th, nth, lang, source): the one narrow corpus text scan the
    * whole text-serving surface shares — th = md5(raw text), the near-dup
    * family's collapse key (null-propagating: md5(NULL) is NULL on both
    * engines, the gate-pinned contract); nth = md5(normalized text), the
    * exact-dedup / cluster key. lang/source ride along: they are
    * byte-sized next to the text column this scan exists to hash, and
    * they spare the DSIR / mixture consumers a doc_id re-join.
    */
  def th(s: SparkSession, d: String): DataFrame =
    // r13: the mapping is the persisted THM artifact ([[AnnIndex
    // .docHashes]] — fingerprint-keyed, delta-appended, streaming-
    // maintained); a NEW session's first serve is a pure artifact load,
    // not a corpus md5 pass, and no corpus-sized frame occupies executor
    // storage for the session's life (verdict r12 #5). The memo keeps
    // only the resolved reader handle.
    SessionMemo.handle(s, d, "thm", Seq("documents.parquet")) {
      AnnIndex.docHashes(s, d)
    }

  /** The exact-duplicate group structure over [[th]]:
    * members (rep, doc_id, th) and reps (doc_id = the group's min member,
    * th, gsz). groupBy + equi-join back, NOT min/count over a window on
    * the content key — a window partition is one unsplittable task and a
    * mass-duplicate text is a magnet key; the groupBy is map-side
    * combined and the join back AQE-skew-splittable (the r8 device).
    */
  def thGroups(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // BOTH frames are session persists (r13): with th serving from the
    // THM artifact (an unpersisted multi-file reader) instead of the r12
    // in-memory md5 frame, a derived members pipeline re-ran the THM
    // scan + group join inside EVERY BroadcastExchange collect that
    // referenced it (~7x per expansion serve, measured ~20 task-sec of
    // pure fixed overhead per q_dedup_contain pass at sf0.1). members is
    // narrow — (rep, doc_id, th), O(corpus ids), the same storage class
    // as the r12 th frame — and the eager build count materializes it
    // once per session. (The r11 "don't materialize the join" note was
    // about the FAT members×members expansion output, not this narrow
    // id mapping.)
    val fs = SessionMemo.frames(s, d, "thg", Seq("documents.parquet")) {
      val groups = th(s, d).groupBy("th")
        .agg(min("doc_id").as("rep"), count(lit(1)).as("gsz"))
      // members is REPARTITIONED at build: a cached frame freezes its
      // partitioning for the session, and with th reading a row-bounded
      // artifact (possibly ONE file) the whole downstream chain would
      // inherit 1-4 partitions — at 100x the 208M-row simhash expansion
      // collapsed to 4 tasks (155 s vs 25). Hash by rep: full parallelism
      // for every consumer, and the cached HashPartitioning lets the
      // within-group member self-joins (x.rep = y.rep) skip both
      // exchanges.
      Seq(groups,
        th(s, d).join(groups.select("th", "rep"), "th")
          .select(col("rep"), col("doc_id"), col("th"))
          .repartition(s.sparkContext.defaultParallelism, col("rep")))
    }
    val (groups, members) = (fs(0), fs(1))
    (members, groups.select(col("rep").as("doc_id"), col("th"), col("gsz")))
  }

  /** Exact distinct-text count — the guarded-broadcast bound for the
    * rep/cnt id-mapping join sides (Dedup.bcIf): one count over the
    * already-materialized groups cache, memoized per session.
    */
  def thDistinct(s: SparkSession, d: String): Long =
    SessionMemo.scalar(s, d, "thn", Seq("documents.parquet")) {
      thGroups(s, d)._2.count()
    }

  /** Exact distinct-vector count, the embedding twin of [[thDistinct]] —
    * the PQ family's ADC rescore depth scales with it (r15): one count
    * over the already-materialized reps cache, memoized per session.
    */
  def ehDistinct(s: SparkSession, d: String): Long =
    SessionMemo.scalar(s, d, "ehn", Seq("embeddings.parquet")) {
      eh(s, d)._2.count()
    }

  /** The embedding twin over `embeddings.parquet`:
    * members (rep, vec_id, eh) and reps (vec_id = the group's min member,
    * eh, v, nrm, gsz) — eh is the 128-bit content hash
    * ([[AnnIndex.ehCol]]), and the group key inside the build is
    * (eh, RAW VECTOR): the raw vector stays a secondary equality key so
    * even a 128-bit collision of distinct vectors cannot merge them in
    * the served id mapping. reps carries the vector itself — one row per
    * DISTINCT vector, so on a k×-duplicated corpus the persisted frame is
    * 1/k of the table and every dot-product consumer prices per distinct.
    */
  def eh(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // r13: the (vec_id, eh) hashes serve from the persisted EHM artifact
    // ([[AnnIndex.vecHashes]]) — a new session no longer re-hashes every
    // vector; it re-reads the vector column once (the (eh, RAW VECTOR)
    // secondary equality key that keeps a 128-bit collision from merging
    // distinct vectors), which is scan work, not hash work. Group
    // structure (distinct-vector-sized) and the narrow member mapping
    // stay session persists as before.
    val hashes = SessionMemo.handle(s, d, "ehm", Seq("embeddings.parquet")) {
      AnnIndex.vecHashes(s, d)
    }
    val fs = SessionMemo.frames(s, d, "ehg", Seq("embeddings.parquet")) {
      val tagged = T.embeddings(s, d)
        .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
        .withColumn("nrm", Vectors.norm(col("v")))
        .join(hashes, "vec_id")
      val groups = tagged.groupBy("eh", "v")
        .agg(min("vec_id").as("rep"), min("nrm").as("nrm"),
          count(lit(1)).as("gsz"))
      Seq(
        // repartitioned at build like the text twin: cached partitioning
        // is session-frozen and must not inherit a source scan's file
        // layout; hashing by rep co-partitions the member self-joins
        tagged.select("vec_id", "eh", "v")
          .join(groups.select("eh", "v", "rep"), Seq("eh", "v"))
          .select(col("rep"), col("vec_id"), col("eh"))
          .repartition(s.sparkContext.defaultParallelism, col("rep")),
        groups.select(col("rep").as("vec_id"), col("eh"), col("v"),
          col("nrm"), col("gsz")))
    }
    (fs(0), fs(1))
  }
}

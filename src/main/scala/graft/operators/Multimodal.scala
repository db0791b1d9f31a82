package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Q, T}

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata. The Spark-side pipeline — binary payload column, metadata
  * struct schema, per-row feature extraction, partition-friendly batch
  * shape — is real and oracle-checked, and the decode kernel now parses
  * REAL container headers (PNG IHDR, JPEG SOFn, GIF logical screen
  * descriptor) by pure byte arithmetic — no codec library. Payloads that
  * are not recognizable media (e.g. the text corpus cast to binary) take
  * a deterministic length-derived fallback, which is also the formula the
  * oracle-checked column pipeline mirrors, so the two paths agree on
  * text-only tables end-to-end. Full pixel decode (which WOULD need a
  * codec, absent in this container) would slot in at the same
  * one-init-per-partition seam.
  */
object Multimodal {

  /** G. Binary payload + metadata extraction over the text corpus.
    * `width/height/frames` are the deterministic non-media fallback
    * outputs (the documents table carries no media payloads — media bytes
    * go through [[parseHeader]] in the batch seam), expressed as columns
    * so the oracle can verify the plumbing end-to-end.
    */
  val multimodalMeta: Q = Q(
    "q_multimodal_meta",
    (s, d) => {
      val payload = col("text").cast("binary")
      T.documents(s, d)
        .select(
          col("doc_id"),
          octet_length(payload).cast("long").as("byte_len"),
          sha2(payload, 256).as("sha256_hex"))
        // --- STUB decode seam: replace with a real codec at the same
        // --- schema: struct<width:int,height:int,frames:int>
        .withColumn("width", (col("byte_len") % 640 + 16).cast("long"))
        .withColumn("height", (col("byte_len") % 480 + 16).cast("long"))
        .withColumn("frames", (col("byte_len") % 24 + 1).cast("long"))
        .transform(Det.sortAll)
    },
    Some("""SELECT doc_id,
            |       CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
            |       sha256(text) AS sha256_hex,
            |       CAST(octet_length(text::BLOB) % 640 + 16 AS BIGINT) AS width,
            |       CAST(octet_length(text::BLOB) % 480 + 16 AS BIGINT) AS height,
            |       CAST(octet_length(text::BLOB) % 24 + 1 AS BIGINT) AS frames
            |FROM documents ORDER BY ALL""".stripMargin)
  )

  /** Typed decode output: the schema a real media decoder would emit. */
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Int, height: Int,
      frames: Int, sha256_hex: String)

  /** Width/height from real media container headers — pure byte
    * arithmetic, no codec library:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk (the spec requires it
    *    first): big-endian width at offset 16, height at 20.
    *  - JPEG: SOI (FFD8), then marker segments walked by their big-endian
    *    lengths until a SOFn frame header (C0–CF minus C4/C8/CC), which
    *    carries precision(1), height(2), width(2) after the length; stops
    *    at SOS — dimensions must precede entropy-coded data.
    *  - GIF: "GIF87a"/"GIF89a" magic AND the mandatory 0x3B trailer as
    *    the final byte (the magic alone is printable ASCII, so text can
    *    start with it), then the logical screen descriptor's
    *    little-endian width at offset 6, height at 8.
    *
    * None for anything else (malformed media included) — never a guess.
    */
  private[graft] def parseHeader(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 24 &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      Some((be32(16), be32(20)))
    } else if (b.length >= 13 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a' &&
        u8(b.length - 1) == 0x3b) {
      // Unlike PNG's 0x89 and JPEG's 0xFF, the GIF magic is printable
      // ASCII — a text document can legitimately START with "GIF89a".
      // Requiring the full logical screen descriptor AND the mandatory
      // 0x3B trailer as the final byte means a misidentified text doc
      // must both open with the magic and end with ";" — the same
      // residual ambiguity file(1)-style sniffing accepts. PNG/JPEG need
      // no such tie-break: their signatures cannot occur in UTF-8 text.
      Some((le16(6), le16(8)))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if (u8(i) != 0xff) return None // desynced — not a marker stream
        var j = i + 1
        while (j < b.length && u8(j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return None
        val marker = u8(j)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (j + 7 < b.length) Some((be16(j + 6), be16(j + 4))) else None
        }
        if (marker == 0xda) return None // SOS: no SOF seen before scan data
        if ((marker >= 0xd0 && marker <= 0xd9) || marker == 0x01) i = j + 1 // standalone
        else if (j + 2 < b.length && be16(j + 1) >= 2) i = j + 1 + be16(j + 1)
        else return None
      }
      None
    } else None
  }

  /** Batch decode kernel — the per-partition seam. Batch shape is the
    * contract: the decoder gets an iterator per partition so expensive
    * init (here the SHA digest; in a pixel-decode deployment, a JNI/FFI
    * codec) is amortized across the batch; output is a typed row per
    * media object. Dimensions come from [[parseHeader]] for real media
    * payloads (frames=1 for stills), with a deterministic length-derived
    * fallback for non-media bytes — the same formula the column pipeline
    * mirrors, so both paths agree on text corpora.
    */
  def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    // >>> once-per-partition init (real pixel codec would go here) <<<
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    batch.map { case (id, bytes) =>
      val n = bytes.length.toLong
      val sha = digest.digest(bytes).map("%02x".format(_)).mkString
      digest.reset()
      parseHeader(bytes) match {
        case Some((w, h)) => MediaMeta(id, n, w, h, 1, sha)
        case None => MediaMeta(id, n, (n % 640 + 16).toInt, (n % 480 + 16).toInt,
          (n % 24 + 1).toInt, sha)
      }
    }
  }

  /** Walk a GIF's block structure by pure byte arithmetic and return one
    * (byte offset, width, height) per image frame — the frame-extraction
    * primitive for multi-frame media, no codec library. GIF layout
    * (public spec, GIF89a): header(6) + logical screen descriptor(7,
    * plus global color table when flagged) + a block sequence — 0x21
    * extensions (label + length-prefixed sub-blocks, 0-terminated),
    * 0x2C image descriptors (9 bytes + local color table when flagged +
    * LZW min-code byte + length-prefixed data sub-blocks), 0x3B trailer.
    * Pixel data is SKIPPED via the length prefixes — LZW is never
    * decoded, so walking a frame costs O(sub-block count), not O(pixels).
    * A malformed/truncated stream returns the frames found so far
    * (sniffing semantics, like [[parseHeader]]); an unknown block type
    * stops the walk rather than misparse.
    */
  private[graft] def gifFrames(b: Array[Byte]): Seq[(Long, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val out = Seq.newBuilder[(Long, Int, Int)]
    if (b.length < 14 ||
        !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return Nil
    var i = 6
    val flags = u8(i + 4)
    i += 7
    if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 7) + 1))
    def skipSubBlocks(j0: Int): Int = {
      var j = j0
      while (j < b.length && u8(j) != 0) j += 1 + u8(j)
      j + 1 // past the 0 terminator
    }
    var done = false
    while (!done && i < b.length) {
      u8(i) match {
        case 0x3b => done = true
        case 0x21 =>
          if (i + 2 >= b.length) done = true
          else i = skipSubBlocks(i + 2)
        case 0x2c =>
          if (i + 10 >= b.length) done = true
          else {
            out += ((i.toLong, le16(i + 5), le16(i + 7)))
            val lflags = u8(i + 9)
            var j = i + 10
            if ((lflags & 0x80) != 0) j += 3 * (1 << ((lflags & 7) + 1))
            i = skipSubBlocks(j + 1) // +1: LZW minimum-code-size byte
          }
        case _ => done = true
      }
    }
    out.result()
  }

  /** APNG frame walk — the PNG-container twin of [[gifFrames]], so the
    * keyframe-sampling seam rests on two real multi-frame containers:
    * walk the chunk stream (4-byte big-endian length | 4-byte type |
    * data | 4-byte crc, per the public PNG/APNG spec) and emit one
    * (chunk byte offset, width, height) per fcTL frame-control chunk
    * (width/height are the data's 2nd/3rd big-endian u32s, after the
    * sequence number). A still PNG has no fcTL and emits nothing —
    * decodeDataset's frames=1 rows. Pure byte arithmetic: pixel data
    * (IDAT/fdAT) is never decoded, so the walk costs O(chunk count).
    * Malformed/truncated streams return the frames found so far; a
    * length overrunning the buffer stops the walk rather than misparse
    * (the [[parseHeader]] sniffing semantics).
    */
  private[graft] def apngFrames(b: Array[Byte]): Seq[(Long, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 8 || !(0 until 8).forall(i => u8(i) == sig(i))) return Nil
    val out = Seq.newBuilder[(Long, Int, Int)]
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(i)
      if (len > (b.length - i - 12).toLong) done = true // truncated/bogus
      else if (b(i + 4) == 'I' && b(i + 5) == 'E' && b(i + 6) == 'N' &&
          b(i + 7) == 'D') done = true
      else {
        if (b(i + 4) == 'f' && b(i + 5) == 'c' && b(i + 6) == 'T' &&
            b(i + 7) == 'L' && len >= 26)
          out += ((i.toLong, be32(i + 12).toInt, be32(i + 16).toInt))
        i += 12 + len.toInt
      }
    }
    out.result()
  }

  case class FrameMeta(doc_id: Long, frame_idx: Int, byte_offset: Long,
      width: Int, height: Int)

  /** Frame-sampling seam — the video keyframe-sampling shape over
    * multi-frame payloads: every `stride`-th frame as a typed row
    * (frame_idx stride = the fps-downsample of a real pipeline), same
    * per-partition batch contract as [[decodeBatch]] (one walker/codec
    * init per partition, rows streamed through; a frame's pixel decode
    * would hang off byte_offset here). Stills and non-media payloads
    * emit nothing — they are decodeDataset's frames=1 rows.
    */
  def frameSampleBatch(stride: Int)(
      batch: Iterator[(Long, Array[Byte])]): Iterator[FrameMeta] =
    batch.flatMap { case (id, bytes) =>
      // container signatures are mutually exclusive, so at most one
      // walker emits; each returns Nil immediately on a foreign payload
      (gifFrames(bytes) ++ apngFrames(bytes)).zipWithIndex.collect {
        case ((off, w, h), idx) if idx % stride == 0 =>
          FrameMeta(id, idx, off, w, h)
      }
    }

  /** The Spark-side plumbing for frame sampling: (doc_id, payload:binary)
    * → sampled frame rows, narrow per-partition pass (no shuffle — frame
    * explosion is bounded by the stride and rides the scan).
    */
  def frameSample(s: SparkSession, media: DataFrame,
      stride: Int = 2): Dataset[FrameMeta] = {
    import s.implicits._
    media.as[(Long, Array[Byte])].mapPartitions(frameSampleBatch(stride))
  }

  /** G. mapPartitions batch-decode pipeline over the binary payload
    * column — partitioning and batch shape are what a 100 TB media corpus
    * needs (one codec init per partition, streaming rows through).
    */
  def decodeDataset(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    // no repartition: decode is a narrow per-partition pass, and at scale
    // a media corpus is many files — scan parallelism is free. An up-front
    // round-robin shuffle here would move every payload byte across the
    // cluster just to fix a single-file local-test layout.
    T.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
  }

  /** G. Binary near-dup (r7) — image/media dedup over opaque payload
    * bytes, routed through the SAME capped-bucket near-dup family as the
    * text operators: re-encoded or lightly-edited copies of a media
    * object (metadata strip, trailing-byte change) differ in a few bytes
    * but share most byte shingles, so a simhash over 8-byte shingles at
    * stride 4 puts them within a small hamming distance.
    *
    *  - exact pre-collapse on md5(payload): byte-identical copies — the
    *    mass case in a crawl — collapse before the candidate machinery
    *    (the collapseExact discipline), so a k×-replicated image costs k,
    *    not k².
    *  - per-distinct-payload 64-bit simhash from a bit-majority vote over
    *    xxhash64(8-byte shingle) values — one narrow explode + one
    *    groupBy, no UDF, whole-stage codegen throughout. Shingles are
    *    taken at EVERY byte offset and then sampled by hash value
    *    (keep h ≡ 0 mod 4) — content-defined sampling, NOT a fixed
    *    stride: an insertion/deletion shifts all downstream bytes, and
    *    stride-aligned windows would then sample entirely different
    *    content (≈50% shingle loss from a 2-byte shift — measured while
    *    building the planted-pair spec), where the all-offsets window
    *    SET is shift-invariant outside the edit neighborhood and the
    *    hash-mod sample inherits that invariance at a quarter of the
    *    vote volume.
    *  - 8-bit chunk blocking with the shared [[Dedup.capBuckets]] skew
    *    guard (≤64 per bucket), hamming ≤ 12 via bit_count(xor) — the
    *    identical bound class as q_dedup_simhash, so the 100 TB candidate
    *    analysis carries over verbatim.
    *
    * Payloads here are the text corpus cast to binary (the multimodal
    * convention — no real media in the container); the operator never
    * looks inside the bytes except through [[parseHeader]]-class byte
    * arithmetic, so real image payloads take the identical plan.
    * Approximate blocking ⇒ rows-only driver check + planted-pair spec.
    *
    * r10: the signature stage persists ([[AnnIndex.textSigs]] family BIN,
    * keyed by the distinct payload's md5) — the all-offsets explode +
    * 64-bit vote runs once per table content, not once per session, and
    * a crawl batch appends only its genuinely-novel payloads' signatures
    * (duplicates of known bytes add zero rows). Spec proves the persisted
    * serve row-identical to the direct computation.
    */
  /** The BIN signature encode — the corpus-pass cost of [[binaryDedup]],
    * persisted behind [[AnnIndex.textSigs]] (family BIN). Input: one row
    * per DISTINCT payload, keyed by `th` = md5 of the bytes (for the text
    * corpus cast to binary, md5(text) over the identical UTF-8 bytes —
    * collapseExact's key discipline). The simhash is a pure function of
    * the payload, so the artifact is append-stable: new duplicates of a
    * known payload add ZERO rows, and a pure file append encodes only
    * genuinely-novel content. Output: (th, simhash).
    *
    * 8-byte shingles at every offset (substring is 1-based; payloads
    * shorter than 8 bytes yield their whole tail as the one shingle),
    * then the deterministic hash-mod sample — see [[binaryDedup]]'s
    * scaladoc on why a fixed stride would break under byte shifts.
    */
  private[graft] def binSigs(fresh: DataFrame): DataFrame = {
      val payloads = fresh.select(col("th"), col("text").cast("binary").as("payload"))
      val shingleExpr = expr(
        "array_distinct(transform(" +
          "sequence(0, greatest(0L, octet_length(payload) - 8)), " +
          "i -> xxhash64(substring(payload, cast(i+1 as int), 8))))")
      val allSh = payloads.select(col("th"),
          octet_length(col("payload")).as("plen"), explode(shingleExpr).as("h"))
      // tiny payloads (<32 windows ⇔ plen < 39: windows = plen − 7) keep
      // every shingle so their signature isn't vote-starved by the sample
      val sampled = allSh
        .where(pmod(col("h"), lit(4L)) === 0L || col("plen") < 39)
        .select("th", "h")
      // sampled-out backstop: a payload just above the tiny cutoff whose
      // EVERY window hash misses h ≡ 0 (mod 4) — P ≈ 0.75^windows, rare
      // but real — would emit no signature and silently become unpairable
      // by anything but an exact byte copy. Such payloads fall back to
      // voting with ALL their shingles (the tiny-payload rule applied a
      // posteriori). The fallback list is expected-empty, so the
      // re-explode almost never materializes a row.
      val starved = payloads.select("th", "payload")
        .join(sampled.groupBy("th").agg(count(lit(1)).as("nsh")),
          Seq("th"), "left_anti")
        .select(col("th"), explode(shingleExpr).as("h"))
      val sh = sampled.union(starved)
      val bitSums = (0 until 64).map(i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"b$i"))
      sh.groupBy("th").agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash",
          (0 until 64).map(i =>
            when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
            .reduce(_ bitwiseOR _))
        .select("th", "simhash")
  }

  val binaryDedup: Q = Q(
    "q_dedup_binary",
    (s, d) => {
      val hashed = T.spread(s, T.documents(s, d)) // r16: conditional spread
        .where(col("text").isNotNull)
        // md5(text) IS md5 of the payload bytes: the binary cast is the
        // identity on the UTF-8 encoding md5 already hashes
        .select(col("doc_id"), md5(col("text")).as("ph"))
      // exact pre-collapse via groupBy + equi-join, not a window over the
      // payload hash: a byte-identical viral image is ONE key carrying
      // millions of rows at 100 TB, and a window partition is a single
      // unsplittable task (same device as Dedup.collapseExact).
      val groups = hashed.groupBy("ph").agg(min("doc_id").as("rep"))
      val members = hashed.join(groups, "ph")
        .select(col("rep"), col("doc_id"))
      // the all-offsets shingle explode + 64-bit vote — THE corpus-pass
      // cost — serves from the persisted th-keyed BIN signature table
      // (r10): a run re-derives only the cheap doc↔hash mapping above and
      // joins the frozen signatures back per distinct payload
      val persisted = AnnIndex.textSigs(s, d, "BIN", binSigs)
      val sigs = groups.join(persisted, groups("ph") === persisted("th"))
        .select(col("rep").as("doc_id"), col("simhash"))
      val rawChunks = sigs.select(col("doc_id"), col("simhash"), posexplode(array(
        (0 until 8).map(c => shiftright(col("simhash"), 8 * c).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
      val chunks = Dedup.capBuckets(rawChunks, Seq("chunk_idx", "chunk"), 64)
      val repPairs = chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
            col("a.chunk") === col("b.chunk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
            .as("hamming"))
        .distinct()
      val within = members.as("x")
        .join(members.as("y"),
          col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(0L).as("hamming"))
      Dedup.expandPairs(repPairs.where(col("hamming") <= 12), members,
          Seq("hamming"))
        .union(within)
        .transform(Det.sortAll)
    },
    None
  )

  val all: Seq[Q] = Seq(multimodalMeta, binaryDedup)
}

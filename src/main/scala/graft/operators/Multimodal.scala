package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Q, T}

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata. The Spark-side pipeline — binary payload column, metadata
  * struct schema, per-row feature extraction, partition-friendly batch
  * shape — is real and oracle-checked; the actual media *decode* is a
  * STUB (this container has no image/audio codecs): `fakeDecode` derives
  * deterministic pseudo-dimensions from the payload, standing in for a
  * real `mapInPandas`/JNI decoder at the marked seam.
  */
object Multimodal {

  /** G. Binary payload + metadata extraction. `width/height/frames` are
    * the STUBBED decode outputs (see object doc) — deterministic functions
    * of payload length so the oracle can verify the plumbing end-to-end.
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

  /** STUB decode kernel — the seam where a real codec (JNI/FFI image or
    * audio library, absent in this container) would process one partition's
    * batch of payloads. Batch shape is the real contract: the decoder gets
    * an iterator per partition so a native codec can amortize init across
    * the batch; output is a typed row per media object. The fake decode is
    * deterministic in the payload bytes.
    */
  def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    // >>> real codec init would happen here, once per partition <<<
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    batch.map { case (id, bytes) =>
      val n = bytes.length.toLong
      val sha = digest.digest(bytes).map("%02x".format(_)).mkString
      digest.reset()
      MediaMeta(id, n, (n % 640 + 16).toInt, (n % 480 + 16).toInt,
        (n % 24 + 1).toInt, sha)
    }
  }

  /** G. mapPartitions batch-decode pipeline over the binary payload
    * column — partitioning and batch shape are what a 100 TB media corpus
    * needs (one codec init per partition, streaming rows through).
    */
  def decodeDataset(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    T.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
  }

  val all: Seq[Q] = Seq(multimodalMeta)
}

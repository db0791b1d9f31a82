package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Q, T}
import graft.functions.Vectors

/** Similarity search over the embedding column.
  *
  *  - q_dedup_embed: cosine-threshold near-dup pairs (the embedding leg of
  *    the dedup family).
  *  - q_ann_topk: brute-force cosine top-k — the exactness baseline. The
  *    query set is broadcast, so the corpus is scanned once with no
  *    shuffle; cost is O(|corpus|·|queries|·dim) map work.
  *  - q_ann_lsh: random-hyperplane LSH buckets — the scale path: both
  *    sides bucket to a signature, the join only compares within a bucket.
  *
  * All cosines use the identical IEEE formula on both engines
  * (dot/(sqrt(dot_aa)*sqrt(dot_bb)), index-order sums) so even the double
  * column hash-matches the DuckDB oracle.
  */
object Similarity {

  private def vecs(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      // the table lands as one parquet file = one partition; the pair
      // joins below are nested-loop joins that preserve the streamed
      // side's partitioning, so spread the corpus across the cluster first
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))

  private val cos =
    Vectors.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))

  /** G. Embedding-cosine near-dup pairs (threshold chosen off any value's
    * float neighborhood; nearest observed cosine is 2.9e-5 from it).
    */
  val dedupEmbed: Q = Q(
    "q_dedup_embed",
    (s, d) => {
      val e = vecs(s, d)
      broadcast(e.as("a"))
        .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          cos.as("cosine"))
        .where(col("cosine") >= 0.35)
        .transform(Det.sortAll)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            |       list_inner_product(a.v, b.v) /
            |         (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cosine
            |FROM e a JOIN e b ON a.vec_id < b.vec_id
            |WHERE list_inner_product(a.v, b.v) /
            |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.35
            |ORDER BY ALL""".stripMargin),
    headline = true
  )

  /** G. Brute-force cosine top-5 for the first 20 vectors as queries. */
  val annTopK: Q = Q(
    "q_ann_topk",
    (s, d) => {
      val e = vecs(s, d)
      val queries = e.where(col("vec_id") < 20)
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      broadcast(queries).as("a")
        .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
          cos.as("cosine"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .transform(Det.sortAll)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |p AS (
            |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
            |         list_inner_product(a.v, b.v) /
            |           (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cosine
            |  FROM e a JOIN e b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
            |), r AS (
            |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            |              ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn
            |  FROM p
            |)
            |SELECT query_id, neighbor_id, cosine, rn FROM r WHERE rn <= 5
            |ORDER BY ALL""".stripMargin),
    headline = true
  )

  /** G. LSH-bucketed approximate top-k: 8 seeded random hyperplanes give a
    * 256-bucket signature; neighbors are only scored within the query's
    * bucket. Approximate ⇒ rows-only driver check; the spec measures
    * recall against q_ann_topk.
    */
  val annLsh: Q = Q(
    "q_ann_lsh",
    (s, d) => {
      val rnd = new scala.util.Random(42)
      val planes: Seq[Seq[Double]] =
        Seq.fill(8)(Seq.fill(64)(rnd.nextDouble() - 0.5))
      def bucketOf(v: org.apache.spark.sql.Column) =
        planes.zipWithIndex.map { case (p, i) =>
          val planeCol = array(p.map(lit): _*)
          when(Vectors.dot(v, planeCol) > 0, lit(1 << i)).otherwise(lit(0))
        }.reduce(_ + _)
      val e = vecs(s, d).withColumn("bucket", bucketOf(col("v")))
      val queries = e.where(col("vec_id") < 20)
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      broadcast(queries).as("a")
        .join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
          col("a.bucket").as("bucket"), cos.as("cosine"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .transform(Det.sortAll)
    },
    None
  )

  /** G. IVF-style ANN: coarse quantization to a small centroid set, probe
    * the closest nprobe=4 cells per query, score only those candidates.
    * The centroid "codebook" here is a deterministic sample (first 16
    * vectors) standing in for a k-means training job — the assignment /
    * probe / rescore dataflow is the real scale path: corpus assignment is
    * one narrow pass against a broadcast codebook, and the candidate join
    * is equi on cluster_id. Approximate ⇒ rows-only driver check.
    */
  val annIvf: Q = Q(
    "q_ann_ivf",
    (s, d) => {
      val e = vecs(s, d)
      val centroids = e.where(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
      val centCos = Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm"))
      // assignment: argmax-cosine centroid per vector
      def assign(df: DataFrame, k: Int, outPrefix: String): DataFrame = {
        val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("c_id"))
        df.crossJoin(broadcast(centroids))
          .withColumn("ccos", centCos)
          .withColumn("crank", row_number().over(w))
          .where(col("crank") <= k)
          .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as(s"${outPrefix}cluster"))
      }
      val corpus = assign(e, 1, "")
      val queries = assign(e.where(col("vec_id") < 20), 4, "q")
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      queries.join(corpus, col("qcluster") === col("cluster") &&
          col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cluster"),
          (Vectors.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .transform(Det.sortAll)
    },
    None
  )

  val all: Seq[Q] = Seq(dedupEmbed, annTopK, annLsh, annIvf)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke corpus builder: replicates an SF directory `factor`× with
  * key offsets, so Bench can be pointed at a corpus one order of magnitude
  * larger than the largest driver-generated SF.
  *
  * Facts (orders/lineitem/events) get offset join keys per replica so join
  * cardinalities scale linearly, like a real bigger SF. Dimensions are
  * copied as-is (dims grow sub-linearly in every star schema). documents /
  * embeddings keep their text/vectors VERBATIM across replicas on purpose:
  * 10 exact copies of every doc is precisely the mass-duplicate hot-bucket
  * stress that the dedup family's candidate caps (SURVEY §5) must survive —
  * an adversarial corpus, not a convenient one.
  *
  * Usage: runMain graft.MakeScale <srcDir> <outDir> [factor]
  */
object MakeScale {
  private val Off = 100000000L // replica key offset; far above any sf0.1 key

  def main(args: Array[String]): Unit = {
    val src    = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out    = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark  = GraftSession("local[32]", shufflePartitions = 32)
    try build(spark, src, out, factor)
    finally spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val reps = spark.range(factor).withColumnRenamed("id", "rep")

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    // One scan per table; crossJoin with the tiny replica range broadcasts
    // the range side, so replication is a narrow map over the source scan.
    def replicate(t: String, keyCols: Seq[String], tsCols: Seq[String] = Nil): DataFrame = {
      // events goes through T's encoding normalization (long nanos
      // whether the source is TIMESTAMP(NANOS) or TIMESTAMP(MICROS)) so
      // the nanos offset below is always long arithmetic
      var df = (if (t == "events") T.events(spark, src) else load(t))
        .crossJoin(broadcast(reps))
      for (k <- keyCols) df = df.withColumn(k, col(k) + col("rep") * Off)
      // Nudge timestamps per replica so event-time ops see distinct instants
      // rather than `factor` perfectly coincident streams — offset in nanos.
      for (c <- tsCols)
        df = df.withColumn(c, col(c) + col("rep") * 1000000000L)
      df.drop("rep")
    }

    // The narrow replication preserves the source's single-file split, so
    // without an explicit repartition every table would land as 1-2 parquet
    // files — and every downstream scan would get 1-2 input splits,
    // serializing the whole bench. Write the corpus the way a real bigger
    // SF arrives: spread across enough files to feed every core.
    val outParts = spark.sparkContext.defaultParallelism
    val tables: Seq[(String, DataFrame)] = Seq(
      "region"     -> load("region"),
      "nation"     -> load("nation"),
      "customer"   -> load("customer"),
      "supplier"   -> load("supplier"),
      "part"       -> load("part"),
      "orders"     -> replicate("orders", Seq("o_orderkey")),
      "lineitem"   -> replicate("lineitem", Seq("l_orderkey")),
      "events"     -> replicate("events", Seq("event_id", "user_id"), tsCols = Seq("ts")),
      "documents"  -> replicate("documents", Seq("doc_id")),
      "embeddings" -> replicate("embeddings", Seq("vec_id"))
    )
    for ((name, df) <- tables) {
      // dims stay single-file (they're broadcast anyway); facts spread
      val spread =
        if (Set("region", "nation", "customer", "supplier", "part")(name)) df
        else df.repartition(outParts)
      spread.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    println(s"[makescale] wrote ${factor}x $src -> $out")
  }
}

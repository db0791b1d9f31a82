package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Every registered engine operation, in SURVEY §2 order. */
  def registry: Seq[Q] =
    Marts.all ++ QualityTests.all ++ Analyses.all ++ EltOps.all ++
      Relational.all ++ AsOf.all ++ EventOps.all ++ TextAnalysis.all ++
      Dedup.all ++ Similarity.all ++ Multimodal.all ++ Assembly.all ++
      Bpe.all ++ Unigram.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.starJoin.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** DuckDB-equivalent SQL for each SQL-expressible operator. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

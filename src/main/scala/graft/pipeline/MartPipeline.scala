package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.operators.{Analyses, Marts, QualityTests, Staging}

/** The reference's full model graph as a graft Dag: staging views feed the
  * intermediate star join, marts and data tests hang off it — the same
  * topology as dbt/models (staging → intermediate → marts) with the data
  * tests run as part of the build, like `dbt build`. All ten staging
  * views register (mirroring dbt/models/staging/stg__*.sql); they are
  * lazy pruned projections, so unconsumed ones cost a view registration,
  * not a scan.
  */
object MartPipeline {

  def dag(dir: String): Dag = new Dag(
    Staging.names.map(n => Stage(n, Nil, Staging.byName(n, dir))) ++ Seq(
    Stage("int_star", Seq("stg_lineitem", "stg_orders", "stg_customer"),
      s => Marts.starJoin.run(s, dir)),
    Stage("mart_found", Seq("int_star"), s => Marts.foundAgg.run(s, dir)),
    Stage("mart_not_found", Seq("stg_orders", "stg_lineitem"),
      s => Marts.notFound.run(s, dir)),
    Stage("mart_tableau", Seq("stg_orders", "stg_customer"),
      s => Marts.martUnion.run(s, dir)),
    Stage("test_reconcile", Seq("mart_found", "mart_not_found"),
      s => QualityTests.reconcile.run(s, dir)),
    Stage("analysis_ratio", Seq("int_star"), s => Analyses.ratioJoin.run(s, dir))))

  /** Pushdown proof for the staging layer: ≥3 staging views with a
    * consumer predicate must show both the pruned ReadSchema and the
    * pushed filter at the parquet scan — asserted in ExtensionsAndDagSpec.
    */
  def stagingPlans(spark: SparkSession, dir: String): Map[String, String] = {
    import org.apache.spark.sql.functions.col
    Map(
      "stg_lineitem" -> Staging.lineitem(spark, dir)
        .where(col("l_quantity") > 30).select("l_orderkey", "l_quantity"),
      "stg_orders" -> Staging.orders(spark, dir)
        .where(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus"),
      "stg_customer" -> Staging.customer(spark, dir)
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey", "c_mktsegment"),
      "stg_documents" -> Staging.documents(spark, dir)
        .where(col("lang") === "en").select("doc_id", "lang")
    ).map { case (k, df) => k -> df.queryExecution.executedPlan.toString }
  }

  /** Build everything; returns the reconciliation result for gating. */
  def build(spark: SparkSession, dir: String): Boolean = {
    val out = dag(dir).run(spark)
    out("test_reconcile").head().getAs[Boolean]("ok")
  }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.T
import graft.operators.{Analyses, Marts, QualityTests}

/** The reference's full model graph as a graft Dag: staging views feed the
  * intermediate star join, marts and data tests hang off it — the same
  * topology as dbt/models (staging → intermediate → marts) with the data
  * tests run as part of the build, like `dbt build`.
  */
object MartPipeline {

  def dag(dir: String): Dag = new Dag(Seq(
    Stage("stg_lineitem", Nil, s => T.lineitem(s, dir)),
    Stage("stg_orders", Nil, s => T.orders(s, dir)),
    Stage("stg_customer", Nil, s => T.customer(s, dir)),
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

  /** Build everything; returns the reconciliation result for gating. */
  def build(spark: SparkSession, dir: String): Boolean = {
    val out = dag(dir).run(spark)
    out("test_reconcile").head().getAs[Boolean]("ok")
  }
}

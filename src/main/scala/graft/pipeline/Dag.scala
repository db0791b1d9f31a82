package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal model-DAG runner — the Spark-native analog of the reference's
  * dbt model graph + Airflow task ordering (dbt_project.yml materializes
  * staging → intermediate → marts; the Airflow dags order the ELT tasks).
  *
  * Each stage computes a DataFrame from the session (upstream stages are
  * visible as temp views), is registered as a temp view under its name,
  * and may optionally be persisted. Stages run in topological order;
  * independent branches could be submitted concurrently — Spark's
  * scheduler interleaves their jobs — but ordering here is deterministic
  * for reproducibility.
  */
final case class Stage(
    name: String,
    deps: Seq[String],
    build: SparkSession => DataFrame)

final class Dag(stages: Seq[Stage]) {
  private val byName = stages.map(s => s.name -> s).toMap
  require(byName.size == stages.size, "duplicate stage names")
  stages.foreach(s => s.deps.foreach(d =>
    require(byName.contains(d), s"stage ${s.name} depends on unknown $d")))

  /** Topological order (stable: declaration order among ready stages). */
  def order: Seq[String] = {
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    var remaining = stages
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(done.contains))
      require(ready.nonEmpty, s"cycle among ${remaining.map(_.name)}")
      ready.foreach(s => done += s.name)
      remaining = blocked
    }
    done.toSeq
  }

  /** Run every stage, registering each result as a temp view. Returns the
    * materialized frames by name.
    */
  def run(spark: SparkSession): Map[String, DataFrame] =
    order.map { name =>
      val df = byName(name).build(spark)
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
}

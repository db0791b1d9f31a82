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

  /** Per-stage retry — the engine-scope analog of the reference's Airflow
    * task `retries` (dags/setup_dag.py default_args): a transiently
    * failing stage is re-attempted up to `retries` times before the run
    * fails; succeeded stages are never re-run by a downstream failure.
    * (Cron scheduling itself is orchestration, deliberately out of
    * engine scope.)
    */
  def runWithRetries(spark: SparkSession, retries: Int = 2): Map[String, DataFrame] =
    order.map { name =>
      var attempt = 0
      var out: Option[DataFrame] = None
      var last: Throwable = null
      while (out.isEmpty && attempt <= retries) {
        try {
          val df = byName(name).build(spark)
          df.createOrReplaceTempView(name)
          out = Some(df)
        } catch {
          // NonFatal only: retrying after OutOfMemoryError/LinkageError
          // masks a broken JVM, and swallowing InterruptedException
          // defeats cancellation
          case scala.util.control.NonFatal(e) => last = e; attempt += 1
        }
      }
      name -> out.getOrElse(throw new IllegalStateException(
        s"stage $name failed after ${retries + 1} attempts", last))
    }.toMap

  /** Resumable materialized run — task-level idempotency on re-run, the
    * Airflow re-trigger semantics: each stage persists to
    * `$outDir/<name>` and then drops a `_done_<name>` marker; on re-run,
    * marked stages are restored from their parquet instead of rebuilt, so
    * a crashed run resumes from the first incomplete stage and completed
    * work is never recomputed. A stage that crashed mid-write holds no
    * marker and is rewritten with OVERWRITE — the same
    * batch-scoped-overwrite recipe as the streaming idempotent sink, so
    * partial output can't double up either.
    */
  def runResumable(spark: SparkSession, outDir: String): Map[String, DataFrame] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    order.map { name =>
      val marker = new org.apache.hadoop.fs.Path(outDir, s"_done_$name")
      val fs = marker.getFileSystem(hconf)
      if (!fs.exists(marker)) {
        byName(name).build(spark).write.mode("overwrite").parquet(s"$outDir/$name")
        fs.create(marker, true).close()
      }
      val df = spark.read.parquet(s"$outDir/$name")
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
  }
}

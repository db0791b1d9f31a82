package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Plan-shape regression guard over the WHOLE registry: the properties
  * that make the engine survive 100 TB are plan properties, so assert
  * them, not just result values.
  *
  *  - No CartesianProduct anywhere: an accidental non-equi join without a
  *    broadcastable side is the classic silent scale-killer.
  *  - BroadcastNestedLoopJoin only where the broadcast side is provably
  *    tiny by construction (the ANN query sets: ≤20 vectors; the IVF
  *    codebook: ≤16 centroids).
  *  - No Window with an empty partitionSpec: a global window funnels the
  *    whole relation through one task (the q_mart_union bug class —
  *    fixed by two-phase numbering in round 3, kept fixed here).
  */
class PlanGuardSpec extends SparkSpec {

  // broadcast side is bounded by construction, not corpus-sized:
  // the ANN query sets (≤20 vectors) / IVF codebook (≤16 centroids), and
  // q_mart_union's triangular prefix-sum self-join over the per-partition
  // count table (≤ spark.sql.shuffle.partitions rows), and
  // q_substring_score's literal dictionary (a LocalTableScan of a
  // handful of words)
  private val allowedNlj = Set("q_ann_topk", "q_ann_lsh", "q_ann_ivf",
    "q_mart_union", "q_substring_score")

  test("no registered query plans a cartesian product or an unbounded NLJ") {
    for (q <- SparkEntry.registry) {
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      if (!allowedNlj(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans a BroadcastNestedLoopJoin")
    }
  }

  test("no registered query uses a window without a partition spec") {
    for (q <- SparkEntry.registry) {
      val offenders = q.run(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(offenders.isEmpty,
        s"${q.name} has ${offenders.size} global (partition-less) window(s)")
    }
  }

  test("output-order contract: every query ends in a total sort, every oracle in ORDER BY ALL") {
    // the driver hash-compare treats row order as part of the result; the
    // repo rule (CLAUDE.md) is Det.sortAll on the Spark side and ORDER BY
    // ALL on the DuckDB side — guard both so a new operator can't forget
    for (q <- SparkEntry.registry) {
      // analyzed (pre-optimizer) plan: the optimizer rightly elides sorts
      // on provably-single-row results, but the contract is about what the
      // operator declares
      val top = q.run(spark, sfDir).queryExecution.analyzed
      assert(top.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort],
        s"${q.name} does not end in a global Sort (Det.sortAll missing?)")
      q.oracle.foreach(sql => assert(sql.trim.endsWith("ORDER BY ALL"),
        s"${q.name} oracle SQL does not end with ORDER BY ALL"))
    }
  }
}

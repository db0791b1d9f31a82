package graft.operators

import org.apache.spark.sql.functions._
import graft.{Det, Num, Q, T}

/** The reference's dbt data-quality tests as engine operators.
  *
  * Reference shapes:
  *  - count reconciliation (total = matched + unmatched):
  *    dbt/tests/no_lost_videos.sql
  *  - join + SUM-vs-stored-column mismatch finder:
  *    dbt/macros/tests/test_duration_match.sql
  *  - join + COUNT-vs-declared-count mismatch finder:
  *    dbt/macros/tests/test_tracks_count_match.sql
  */
object QualityTests {

  /** C. Single-row reconciliation: |orders| = |with lineitems| + |without|.
    * Three independent aggregates cross-joined — each is a one-pass
    * partial-agg count, no data ever reaches the driver.
    */
  val reconcile: Q = Q(
    "q_reconcile",
    (s, d) => {
      // single pass: one left join against the distinct fact keys computes
      // all three counts (vs. separate semi/anti scans — at 100 TB this is
      // one shuffle instead of three full-table reads)
      val o = T.orders(s, d)
      val m = T.lineitem(s, d).select("l_orderkey").distinct()
      o.join(m, o("o_orderkey") === m("l_orderkey"), "left")
        .agg(count(lit(1)).as("total_cnt"),
          count(m("l_orderkey")).as("matched_cnt"))
        .withColumn("unmatched_cnt", col("total_cnt") - col("matched_cnt"))
        .withColumn("ok", col("total_cnt") === col("matched_cnt") + col("unmatched_cnt"))
        .transform(Det.sortAll)
    },
    Some("""SELECT
            |  (SELECT COUNT(*) FROM orders) AS total_cnt,
            |  (SELECT COUNT(*) FROM orders o
            |    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS matched_cnt,
            |  (SELECT COUNT(*) FROM orders o
            |    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS unmatched_cnt,
            |  ((SELECT COUNT(*) FROM orders) =
            |   (SELECT COUNT(*) FROM orders o
            |     WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) +
            |   (SELECT COUNT(*) FROM orders o
            |     WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))) AS ok
            |ORDER BY ALL""".stripMargin)
  )

  /** C. SUM-vs-stored-column mismatch finder in exact integer cents. */
  val sumMatch: Q = Q(
    "q_sum_match",
    (s, d) => {
      val o = T.orders(s, d)
      val l = T.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey"), o("o_totalprice"))
        .agg(sum(Num.cents(l("l_extendedprice"))).as("summed_cents"))
        .select(
          col("o_orderkey"),
          Num.cents(col("o_totalprice")).as("declared_cents"),
          col("summed_cents"),
          (Num.cents(col("o_totalprice")) - col("summed_cents")).as("diff_cents"))
        .where(col("declared_cents") =!= col("summed_cents"))
        .transform(Det.sortAll)
    },
    Some("""WITH g AS (
            |  SELECT o.o_orderkey,
            |         CAST(ROUND(o.o_totalprice*100,0) AS BIGINT) AS declared_cents,
            |         CAST(SUM(CAST(ROUND(l.l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS summed_cents
            |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            |  GROUP BY o.o_orderkey, o.o_totalprice
            |)
            |SELECT o_orderkey, declared_cents, summed_cents,
            |       declared_cents - summed_cents AS diff_cents
            |FROM g WHERE declared_cents <> summed_cents
            |ORDER BY ALL""".stripMargin)
  )

  /** C. COUNT-vs-declared mismatch finder (declared count derived
    * deterministically from the key, standing in for the reference's
    * stored `total_tracks` column).
    */
  val countMatch: Q = Q(
    "q_count_match",
    (s, d) => {
      val o = T.orders(s, d)
      val l = T.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey"))
        .agg(count(lit(1)).as("actual_cnt"))
        .withColumn("declared_cnt", (col("o_orderkey") % 5) + 1)
        .where(col("declared_cnt") =!= col("actual_cnt"))
        .select("o_orderkey", "declared_cnt", "actual_cnt")
        .transform(Det.sortAll)
    },
    Some("""WITH g AS (
            |  SELECT o.o_orderkey, COUNT(*) AS actual_cnt,
            |         (o.o_orderkey % 5) + 1 AS declared_cnt
            |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            |  GROUP BY o.o_orderkey
            |)
            |SELECT o_orderkey, declared_cnt, actual_cnt
            |FROM g WHERE declared_cnt <> actual_cnt
            |ORDER BY ALL""".stripMargin)
  )

  val all: Seq[Q] = Seq(reconcile, sumMatch, countMatch)
}

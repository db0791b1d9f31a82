package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Num, Q, T}

/** General analytics surface: wide aggregation, join+agg+top-k, windowed
  * rank, rollup, pivot, distinct and percentile — the operator set any user
  * of the reference's BigQuery/dbt layer relies on, expressed as single-
  * shuffle Spark plans (partial aggregation map-side, broadcast dims).
  */
object Relational {

  /** F. Wide one-pass aggregation (TPC-H Q1 shape). One shuffle; every
    * aggregate is a map-side partial in exact integer units.
    */
  val q1Pricing: Q = Q(
    "q1_pricing",
    (s, d) => {
      val l = T.lineitem(s, d)
      val cents = Num.cents(col("l_extendedprice"))
      val discPct = Num.cents(col("l_discount"))
      val taxPct = Num.cents(col("l_tax"))
      l.where(col("l_shipdate") <= lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents).as("sum_base_cents"),
          sum(cents * (lit(100L) - discPct)).as("sum_disc_e4"),
          sum(cents * (lit(100L) - discPct) * (lit(100L) + taxPct)).as("sum_charge_e6"),
          count(lit(1)).as("count_order"),
          sum(discPct).as("sum_disc_pct"))
        .withColumn("avg_qty",
          col("sum_qty").cast("double") / col("count_order").cast("double"))
        .withColumn("avg_price",
          col("sum_base_cents").cast("double") / col("count_order").cast("double") / lit(100.0))
        .withColumn("avg_disc",
          col("sum_disc_pct").cast("double") / col("count_order").cast("double") / lit(100.0))
        .drop("sum_disc_pct")
        .transform(Det.sortAll)
    },
    Some("""WITH g AS (
            |  SELECT l_returnflag, l_linestatus,
            |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
            |    CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
            |    CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
            |         * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
            |    CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
            |         * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))
            |         * (100 + CAST(ROUND(l_tax*100,0) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
            |    COUNT(*) AS count_order,
            |    CAST(SUM(CAST(ROUND(l_discount*100,0) AS BIGINT)) AS BIGINT) AS sum_disc_pct
            |  FROM lineitem
            |  WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
            |  GROUP BY l_returnflag, l_linestatus
            |)
            |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_cents, sum_disc_e4,
            |       sum_charge_e6, count_order,
            |       CAST(sum_qty AS DOUBLE) / CAST(count_order AS DOUBLE) AS avg_qty,
            |       CAST(sum_base_cents AS DOUBLE) / CAST(count_order AS DOUBLE) / CAST(100 AS DOUBLE) AS avg_price,
            |       CAST(sum_disc_pct AS DOUBLE) / CAST(count_order AS DOUBLE) / CAST(100 AS DOUBLE) AS avg_disc
            |FROM g ORDER BY ALL""".stripMargin)
  )

  /** F. Join + aggregate + deterministic top-k (TPC-H Q3 shape). The dim
    * filter is broadcast; the two fact tables shuffle once on the join key,
    * which doubles as the grouping key — AQE reuses the exchange.
    */
  val q3TopK: Q = Q(
    "q3_topk",
    (s, d) => {
      val c = T.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      val o = T.orders(s, d).where(col("o_orderdate") < lit("2000-03-15"))
      val l = T.lineitem(s, d).where(col("l_shipdate") > lit("2000-03-15"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(sum(Num.cents(l("l_extendedprice")) *
          (lit(100L) - Num.cents(l("l_discount")))).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"), col("revenue_e4"))
        .transform(Det.sortAll)
    },
    Some("""WITH g AS (
            |  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
            |         CAST(SUM(CAST(ROUND(l.l_extendedprice*100,0) AS BIGINT)
            |              * (100 - CAST(ROUND(l.l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4
            |  FROM lineitem l
            |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
            |  JOIN customer c ON o.o_custkey = c.c_custkey
            |  WHERE c.c_mktsegment = 'BUILDING'
            |    AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
            |    AND l.l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
            |  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            |  ORDER BY revenue_e4 DESC, l_orderkey
            |  LIMIT 10
            |)
            |SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
            |       o_orderpriority, revenue_e4
            |FROM g ORDER BY ALL""".stripMargin)
  )

  /** F. Top-k per group via ranked window (deterministic tiebreak). */
  val topKPerGroup: Q = Q(
    "q_topk_per_group",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      val w = Window.partitionBy("n_name")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("n_name"), col("rn").cast("long").as("rn"), col("c_name"),
          Num.cents(col("c_acctbal")).as("acctbal_cents"))
        .transform(Det.sortAll)
    },
    Some("""WITH r AS (
            |  SELECT n.n_name, c.c_name, c.c_acctbal,
            |         ROW_NUMBER() OVER (PARTITION BY n.n_name
            |             ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
            |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            |)
            |SELECT n_name, CAST(rn AS BIGINT) AS rn, c_name,
            |       CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS acctbal_cents
            |FROM r WHERE rn <= 3 ORDER BY ALL""".stripMargin)
  )

  /** F. ROLLUP hierarchy totals (nation → segment → grand total). */
  val rollup: Q = Q(
    "q_rollup",
    (s, d) => {
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("members"),
          sum(Num.cents(col("c_acctbal"))).as("bal_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          col("members"), col("bal_cents"))
        .transform(Det.sortAll)
    },
    Some("""SELECT COALESCE(n.n_name, 'ALL') AS nation,
            |       COALESCE(c.c_mktsegment, 'ALL') AS segment,
            |       COUNT(*) AS members,
            |       CAST(SUM(CAST(ROUND(c.c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS bal_cents
            |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            |GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Pivot (Spark relational pivot with an explicit value list — no
    * extra distinct-discovery job; DuckDB oracle via conditional agg).
    */
  val pivot: Q = Q(
    "q_pivot",
    (s, d) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(count(lit(1)))
        .na.fill(0L)
        .transform(Det.sortAll)
    },
    Some("""SELECT n.n_name,
            |  CAST(SUM(CASE WHEN c_mktsegment='AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
            |  CAST(SUM(CASE WHEN c_mktsegment='BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
            |  CAST(SUM(CASE WHEN c_mktsegment='FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
            |  CAST(SUM(CASE WHEN c_mktsegment='HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
            |  CAST(SUM(CASE WHEN c_mktsegment='MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
            |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            |GROUP BY n.n_name ORDER BY ALL""".stripMargin)
  )

  /** F. Exact distinct counting per group (two-phase under the hood). */
  val distinctCount: Q = Q(
    "q_distinct",
    (s, d) =>
      T.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("distinct_customers"),
          count(lit(1)).as("orders"))
        .transform(Det.sortAll),
    Some("""SELECT o_orderpriority,
            |       COUNT(DISTINCT o_custkey) AS distinct_customers,
            |       COUNT(*) AS orders
            |FROM orders GROUP BY o_orderpriority ORDER BY ALL""".stripMargin)
  )

  /** F. HLL approximate distinct — the 100 TB path where exact distinct
    * would shuffle every key. Approximate ⇒ rows-only driver check.
    */
  val approxDistinct: Q = Q(
    "q_approx_distinct",
    (s, d) =>
      T.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"))
        .transform(Det.sortAll),
    None
  )

  /** F. Continuous percentiles per group. Quantity is integral and the
    * quartile fractions are binary-exact, so interpolation is engine-
    * independent.
    */
  val percentile: Q = Q(
    "q_percentile",
    (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .transform(Det.sortAll),
    Some("""SELECT l_returnflag,
            |       quantile_cont(l_quantity, 0.25) AS p25,
            |       quantile_cont(l_quantity, 0.5)  AS p50,
            |       quantile_cont(l_quantity, 0.75) AS p75,
            |       COUNT(*) AS n
            |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)
  )

  /** F. Two-phase salted aggregation: explicit skew mitigation for
    * low-cardinality hot grouping keys. Phase 1 aggregates on
    * (key, salt=hash(row)%16) so a hot key's rows spread over 16 reducers;
    * phase 2 merges the 16 partials per key. Bit-identical to the direct
    * groupBy because every aggregate is an exact integer — which is the
    * point of Num's conventions: re-association is free.
    */
  val saltedAgg: Q = Q(
    "q_salted_agg",
    (s, d) => {
      val l = T.lineitem(s, d)
      val salted = l.withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")), lit(16)))
      salted
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(col("l_quantity").cast("long")).as("p_qty"),
          sum(Num.cents(col("l_extendedprice"))).as("p_cents"),
          count(lit(1)).as("p_cnt"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("p_qty")).as("sum_qty"),
          sum(col("p_cents")).as("sum_cents"),
          sum(col("p_cnt")).as("orders"))
        .transform(Det.sortAll)
    },
    Some("""SELECT l_returnflag,
            |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
            |       CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
            |       COUNT(*) AS orders
            |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)
  )

  /** F. Ranking-function suite: rank / dense_rank / percent_rank over a
    * bucketed order key (buckets make ties real, and rank functions are
    * tie-stable: equal keys get equal ranks regardless of row order).
    */
  val rankFuncs: Q = Q(
    "q_rank_funcs",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = T.customer(s, d)
      val bucket = (Num.cents(col("c_acctbal")) / 100000L).cast("long")
      val w = Window.partitionBy("c_mktsegment").orderBy(col("bal_bucket").desc)
      c.select(col("c_custkey"), col("c_mktsegment"), bucket.as("bal_bucket"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("prnk", percent_rank().over(w))
        .transform(Det.sortAll)
    },
    Some("""WITH t AS (
            |  SELECT c_custkey, c_mktsegment,
            |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) // 100000 AS bal_bucket
            |  FROM customer
            |)
            |SELECT c_custkey, c_mktsegment, bal_bucket,
            |       CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY bal_bucket DESC) AS BIGINT) AS rnk,
            |       CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY bal_bucket DESC) AS BIGINT) AS drnk,
            |       PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY bal_bucket DESC) AS prnk
            |FROM t ORDER BY ALL""".stripMargin)
  )

  /** F. Explicit semi join (EXISTS with a correlated predicate). */
  val existsSemi: Q = Q(
    "q_exists_semi",
    (s, d) => {
      val o = T.orders(s, d)
      val big = T.lineitem(s, d).where(col("l_quantity") > 45)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), Num.cents(col("o_totalprice")).as("price_cents"))
        .transform(Det.sortAll)
    },
    Some("""SELECT o_orderkey, CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS price_cents
            |FROM orders o
            |WHERE EXISTS (SELECT 1 FROM lineitem l
            |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Calendar rollup: orders per month with revenue. */
  val monthAgg: Q = Q(
    "q_month_agg",
    (s, d) =>
      T.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("orders"),
          sum(Num.cents(col("o_totalprice"))).as("revenue_cents"))
        .transform(Det.sortAll),
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
            |       COUNT(*) AS orders,
            |       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
            |FROM orders GROUP BY 1 ORDER BY ALL""".stripMargin)
  )

  /** F. SQL surface: the same engine through `spark.sql` over registered
    * views — users of the reference's BigQuery SQL layer get a textual
    * entry point, same Catalyst plans underneath.
    */
  val sqlSurface: Q = Q(
    "q_sql_surface",
    (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      T.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o.o_orderpriority,
              |       CAST(SUM(CAST(ROUND(l.l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS rev_cents,
              |       COUNT(*) AS items
              |FROM lineitem_v l JOIN orders_v o ON l.l_orderkey = o.o_orderkey
              |GROUP BY o.o_orderpriority
              |ORDER BY ALL""".stripMargin)
    },
    Some("""SELECT o.o_orderpriority,
            |       CAST(SUM(CAST(ROUND(l.l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS rev_cents,
            |       COUNT(*) AS items
            |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |GROUP BY o.o_orderpriority
            |ORDER BY ALL""".stripMargin)
  )

  /** F. MERGE / upsert (r8) — the warehouse CDC-apply device Delta/
    * Iceberg call MERGE INTO, expressed Spark-native as ONE full-outer
    * equi-join + CASE: a change batch derived from the order feed
    * (per-customer balance deltas; %50 keys carry a delete marker; %97
    * keys arrive renumbered as net-new customers) applied to the customer
    * dimension snapshot. Action classes: insert (no target match — row
    * synthesized), update (balance += delta), delete (matched + marker;
    * emitted with live=false for auditability, the soft-delete shape),
    * keep (no source match — the untouched majority rides through).
    *
    * Plan shape at scale: the change feed is pre-aggregated per key
    * map-side BEFORE the join (the feed compresses to ≤|dim| rows), then
    * ONE AQE-skew-splittable shuffle equi-join on the dimension key —
    * never a row-at-a-time apply loop. For the batch≪dim steady state the
    * measured-broadcast guard of q_dedup_incremental is the drop-in
    * refinement (semi-join filter the dim scan); the full-outer here is
    * the general backfill-safe shape. Exact integers throughout
    * (graft.Num cents), so every engine computes identical balances.
    */
  val mergeUpsert: Q = Q(
    "q_merge_upsert",
    (s, d) => {
      val dim = T.customer(s, d).select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        Num.cents(col("c_acctbal")).as("bal"))
      val src = T.orders(s, d)
        .groupBy(
          when(col("o_custkey") % 97 === 0, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")).as("ckey"),
          (col("o_custkey") % 50 === 0).as("del"))
        .agg(sum(Num.cents(col("o_totalprice"))).as("delta_cents"),
          count(lit(1)).as("n_orders"))
      val m = dim.join(src, dim("c_custkey") === src("ckey"), "full_outer")
        .withColumn("action",
          when(dim("c_custkey").isNull, lit("insert"))
            .when(src("ckey").isNull, lit("keep"))
            .when(col("del"), lit("delete"))
            .otherwise(lit("update")))
      m.select(
        coalesce(dim("c_custkey"), col("ckey")).as("c_custkey"),
        col("action"),
        when(col("action") === "insert",
          concat(lit("cust#"), col("ckey").cast("string")))
          .otherwise(dim("c_name")).as("c_name"),
        coalesce(col("c_mktsegment"), lit("NEW")).as("c_mktsegment"),
        when(col("action") === "insert", col("delta_cents"))
          .when(col("action") === "update", col("bal") + col("delta_cents"))
          .otherwise(col("bal")).as("acctbal_cents"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        (col("action") =!= "delete").as("live"))
        .transform(Det.sortAll)
    },
    Some("""WITH src AS (
            |  SELECT CASE WHEN o_custkey % 97 = 0 THEN o_custkey + 10000000
            |              ELSE o_custkey END AS ckey,
            |         o_custkey % 50 = 0 AS del,
            |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS delta_cents,
            |         COUNT(*) AS n_orders
            |  FROM orders GROUP BY 1, 2
            |), dim AS (
            |  SELECT c_custkey, c_name, c_mktsegment,
            |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal
            |  FROM customer
            |), m AS (
            |  SELECT d.c_custkey AS dk, s.ckey, s.del, s.delta_cents, s.n_orders,
            |         d.c_name, d.c_mktsegment, d.bal,
            |         CASE WHEN d.c_custkey IS NULL THEN 'insert'
            |              WHEN s.ckey IS NULL THEN 'keep'
            |              WHEN s.del THEN 'delete' ELSE 'update' END AS action
            |  FROM dim d FULL OUTER JOIN src s ON d.c_custkey = s.ckey
            |)
            |SELECT COALESCE(dk, ckey) AS c_custkey, action,
            |       CASE WHEN action = 'insert' THEN 'cust#' || CAST(ckey AS VARCHAR)
            |            ELSE c_name END AS c_name,
            |       COALESCE(c_mktsegment, 'NEW') AS c_mktsegment,
            |       CASE WHEN action = 'insert' THEN delta_cents
            |            WHEN action = 'update' THEN bal + delta_cents
            |            ELSE bal END AS acctbal_cents,
            |       COALESCE(n_orders, 0) AS n_orders,
            |       action <> 'delete' AS live
            |FROM m ORDER BY ALL""".stripMargin)
  )

  /** F. CUBE grouping sets (r8) — the other half of the grouping-sets
    * surface next to q_rollup's hierarchy: all 2² margins of
    * (status, priority) in one pass, disambiguated by grouping_id (bit
    * per cube column, MSB = first). Aggregate rows get a '(all)'
    * sentinel via the grouping bit — NOT via coalescing output nulls,
    * which would (a) conflate a real null data value with a margin row
    * and (b) reintroduce the Spark-nulls-first / DuckDB-nulls-last sort
    * divergence. Plan: CUBE runs as Expand (4 grouping sets per row) but
    * partial aggregation compresses map-side BEFORE the single shuffle,
    * so the Exchange carries ≤4·|groups| rows, not 4·|orders|; output is
    * margin-sized. Exact integer cents.
    */
  val cube: Q = Q(
    "q_cube",
    (s, d) =>
      T.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          sum(Num.cents(col("o_totalprice"))).as("rev_cents"))
        .select(
          when(col("gid").bitwiseAND(2) === 2, lit("(all)"))
            .otherwise(col("o_orderstatus")).as("status"),
          when(col("gid").bitwiseAND(1) === 1, lit("(all)"))
            .otherwise(col("o_orderpriority")).as("priority"),
          col("gid"), col("n_orders"), col("rev_cents"))
        .transform(Det.sortAll),
    Some("""SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)'
            |            ELSE o_orderstatus END AS status,
            |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)'
            |            ELSE o_orderpriority END AS priority,
            |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
            |       COUNT(*) AS n_orders,
            |       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS rev_cents
            |FROM orders
            |GROUP BY CUBE (o_orderstatus, o_orderpriority)
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Approximate percentiles (r8) — the sketch-path twin of
    * q_percentile, completing the mergeable-sketch family next to HLL
    * (q_approx_distinct) and SpaceSaving (q_heavy_hitters): Spark's
    * approx_percentile is a GK/quantile-summary sketch with a
    * guaranteed RANK error ≤ n/accuracy — partial-mergeable, bounded
    * memory per group, the only quantile that survives a 100 TB group
    * (the exact percentile buffers every value of a group in one
    * aggregation state; at web scale that's the collect_set OOM class
    * all over again). accuracy=10000 ⇒ worst-case rank slip n/10⁴.
    * Sketch internals are engine-specific ⇒ rows-only; the spec bounds
    * the result against the exact q_percentile answer by converting the
    * rank guarantee to a value interval on the sorted data.
    */
  val approxPercentile: Q = Q(
    "q_approx_percentile",
    (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.25, 10000)").as("p25"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50"),
          expr("approx_percentile(l_quantity, 0.75, 10000)").as("p75"),
          count(lit(1)).as("n"))
        .transform(Det.sortAll),
    None
  )

  /** F. Fixed-width histogram (r8) — the numeric-distribution profiling
    * op (warehouse data profiling / drift monitoring). Buckets are pure
    * integer arithmetic on exact cents (`div` floor division — no
    * width_bucket bounds pass needed for a fixed-width grid), so the
    * whole histogram is ONE map-side-combinable groupBy whose output is
    * bucket-count-sized; nothing about the plan changes at 100 TB. Per
    * (status, $5k bucket): count, exact revenue mass, and the in-bucket
    * min/max (the profiler's clamp check).
    */
  val histogram: Q = Q(
    "q_histogram",
    (s, d) => {
      val width = 500000L // $5k in cents
      T.orders(s, d)
        .select(col("o_orderstatus").as("status"),
          Num.cents(col("o_totalprice")).as("cents"))
        .withColumn("bucket", expr(s"cents div ${width}L"))
        .groupBy("status", "bucket")
        .agg(count(lit(1)).as("n_orders"),
          sum("cents").as("sum_cents"),
          min("cents").as("min_cents"),
          max("cents").as("max_cents"))
        .withColumn("lo_cents", col("bucket") * width)
        .withColumn("hi_cents", (col("bucket") + 1) * width)
        .transform(Det.sortAll)
    },
    Some("""WITH t AS (
            |  SELECT o_orderstatus AS status,
            |         CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
            |  FROM orders
            |)
            |SELECT status, cents // 500000 AS bucket,
            |       COUNT(*) AS n_orders,
            |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
            |       MIN(cents) AS min_cents, MAX(cents) AS max_cents,
            |       (cents // 500000) * 500000 AS lo_cents,
            |       (cents // 500000 + 1) * 500000 AS hi_cents
            |FROM t GROUP BY status, cents // 500000 ORDER BY ALL""".stripMargin)
  )

  /** F. One-pass column profiling (r8) — the ANALYZE/data-quality summary
    * every warehouse runs on ingest: per column, row count, null count,
    * exact distinct count, and min/max. All five columns profile in ONE
    * aggregate job over one scan; `stack` unpivots the single stats row
    * into the per-column report (driver-sized — 5 rows).
    *
    * Min/max render through exact types only (longs and strings — the
    * double column profiles on its exact cent grid), so the string
    * rendering is engine-neutral; no raw double ever prints. The exact
    * multi-column COUNT(DISTINCT) plans as one Expand (×5) + partial
    * distinct aggregation — one scan, but the Exchange carries
    * per-column distinct values. At 100 TB the profiling flip is
    * approx_count_distinct (HLL, q_approx_distinct's device): same
    * single-pass shape, sketch-sized shuffle — the exact form is kept
    * here because the gate hash-compares and the plan shape (one scan,
    * one agg, stack) is identical either way — `exact = false` IS that
    * flip (r9): the same builder with approx_count_distinct in the
    * distinct slot, spec-checked against the exact path's counts within
    * the sketch's error bound, so the production form is code, not a
    * comment.
    */
  private[graft] def profileIn(s: SparkSession, d: String,
      exact: Boolean): DataFrame = {
    // r16: spread — the multi-column distinct plans as Expand(×5) + a
    // partial distinct aggregate that otherwise rides the local corpus's
    // one scan task (measured: a single 2.1 s task reading 150k rows and
    // emitting 315k partial rows at sf0.1; see T.spread)
    val src = T.spread(s, T.orders(s, d)).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      Num.cents(col("o_totalprice")).as("o_totalprice_cents"),
      col("o_orderpriority"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice_cents", "o_orderpriority")
    def dist(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"c_$c"),
      dist(c).as(s"d_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    val stacked = cols.map(c =>
      s"'$c', c_$c, d_$c, mn_$c, mx_$c").mkString(", ")
    src.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(
        s"stack(${cols.size}, $stacked) as " +
          "(column_name, n_nonnull, n_distinct, min_s, max_s)"))
      .select(col("column_name"), col("n_rows"),
        col("n_nonnull").cast("long").as("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).cast("long").as("n_null"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("min_s"), col("max_s"))
      .transform(Det.sortAll)
  }

  val profile: Q = Q(
    "q_profile",
    (s, d) => profileIn(s, d, exact = true),
    Some("""WITH t AS (
            |  SELECT o_orderkey, o_custkey, o_orderstatus,
            |         CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS o_totalprice_cents,
            |         o_orderpriority
            |  FROM orders
            |), s AS (
            |  SELECT COUNT(*) AS n_rows,
            |    COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
            |      CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
            |    COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
            |      CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
            |    COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
            |      MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
            |    COUNT(o_totalprice_cents) AS c4, COUNT(DISTINCT o_totalprice_cents) AS d4,
            |      CAST(MIN(o_totalprice_cents) AS VARCHAR) AS mn4, CAST(MAX(o_totalprice_cents) AS VARCHAR) AS mx4,
            |    COUNT(o_orderpriority) AS c5, COUNT(DISTINCT o_orderpriority) AS d5,
            |      MIN(o_orderpriority) AS mn5, MAX(o_orderpriority) AS mx5
            |  FROM t
            |)
            |SELECT 'o_orderkey' AS column_name, n_rows, c1 AS n_nonnull, n_rows - c1 AS n_null,
            |       d1 AS n_distinct, mn1 AS min_s, mx1 AS max_s FROM s
            |UNION ALL
            |SELECT 'o_custkey', n_rows, c2, n_rows - c2, d2, mn2, mx2 FROM s
            |UNION ALL
            |SELECT 'o_orderstatus', n_rows, c3, n_rows - c3, d3, mn3, mx3 FROM s
            |UNION ALL
            |SELECT 'o_totalprice_cents', n_rows, c4, n_rows - c4, d4, mn4, mx4 FROM s
            |UNION ALL
            |SELECT 'o_orderpriority', n_rows, c5, n_rows - c5, d5, mn5, mx5 FROM s
            |ORDER BY ALL""".stripMargin)
  )

  val all: Seq[Q] = Seq(q1Pricing, q3TopK, topKPerGroup, rollup, pivot,
    distinctCount, approxDistinct, percentile, saltedAgg, rankFuncs,
    existsSemi, monthAgg, sqlSurface, mergeUpsert, cube, approxPercentile,
    histogram, profile)
}

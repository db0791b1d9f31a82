package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Num, Q, T}

/** Batch event-log operators: time-bucketed aggregation and gap-based
  * sessionization. These are the batch twins of graft.streaming.Events —
  * same semantics, same single shuffle by user/bucket; Structured
  * Streaming variants live in the streaming package and are covered by
  * ScalaTest (MemoryStream) rather than the DuckDB oracle.
  */
object EventOps {

  /** F. Time-bucketed windowed aggregation (hour buckets × event type).
    * Bucket rendered as epoch millis so the result is engine-neutral.
    */
  val windowEvents: Q = Q(
    "q_window_events",
    (s, d) =>
      T.events(s, d)
        .groupBy(
          expr("((ts div 1000000) div 3600000) * 3600000").as("bucket_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("events"),
          sum(Num.cents(col("value"))).as("value_cents"),
          countDistinct(col("user_id")).as("users"))
        .transform(Det.sortAll),
    Some("""SELECT (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms, event_type,
            |       COUNT(*) AS events,
            |       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents,
            |       COUNT(DISTINCT user_id) AS users
            |FROM events GROUP BY 1, 2 ORDER BY ALL""".stripMargin)
  )

  /** F. Gap-based sessionization (30-minute inactivity gap): lag → flag →
    * running sum → per-session rollup. One shuffle by user; each user's
    * timeline streams through the window operator once — the pattern holds
    * at any log size because state is O(1) per key.
    */
  val sessionize: Q = Q(
    "q_sessionize",
    (s, d) => {
      val e = T.events(s, d).select(
        col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"),
        Num.cents(col("value")).as("value_cents"))
      val wOrder = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val wRun = wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("prev_ts", lag(col("ts_ms"), 1).over(wOrder))
        .withColumn("is_new",
          when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("start_ms"),
          max(col("ts_ms")).as("end_ms"),
          sum(col("value_cents")).as("session_value_cents"))
        .withColumn("duration_ms", col("end_ms") - col("start_ms"))
        .transform(Det.sortAll)
    },
    Some("""WITH t AS (
            |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
            |         CAST(ROUND(value*100,0) AS BIGINT) AS value_cents,
            |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ts
            |  FROM events
            |), f AS (
            |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000 THEN 1 ELSE 0 END AS is_new
            |  FROM t
            |), sess AS (
            |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
            |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            |  FROM f
            |)
            |SELECT user_id, session_id, COUNT(*) AS n_events,
            |       MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
            |       CAST(SUM(value_cents) AS BIGINT) AS session_value_cents,
            |       MAX(ts_ms) - MIN(ts_ms) AS duration_ms
            |FROM sess GROUP BY user_id, session_id ORDER BY ALL""".stripMargin)
  )

  /** F. Range (interval) join — the batch twin of the streaming
    * attribution join (graft.streaming.EventStream.attributionJoin): each
    * non-purchase event matches the same user's purchases inside
    * [view_ts, view_ts + 30 min].
    *
    * Spark has no native range-join optimization, and the naive encoding
    * (equi on user + range predicate) leaves a hot key (one bot user with
    * k views × m purchases) doing k·m comparisons. The scale path is the
    * classic BINNED range join: bin width = the window length, purchases
    * carry their single bin, views probe the (at most) two bins their
    * window can overlap, the join is fully equi on (user, bin) and the
    * exact range predicate filters after. A purchase lives in exactly one
    * bin, so no pair can match twice — no dedup pass. Candidate work is
    * bounded by true temporal locality instead of per-user cardinality
    * products.
    */
  val rangeJoin: Q = Q(
    "q_range_join",
    (s, d) => {
      val W = 1800000L
      val e = T.events(s, d)
      val views = e.where(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("view_id"),
          expr("ts div 1000000").as("view_ms"))
      val buys = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          expr("ts div 1000000").as("purchase_ms"))
        .withColumn("bin", expr(s"purchase_ms div $W"))
      val vb = views.withColumn("bin", explode(array_distinct(array(
        expr(s"view_ms div $W"), expr(s"(view_ms + $W) div $W")))))
      vb.join(buys, Seq("user_id", "bin"))
        .where(col("purchase_ms") >= col("view_ms") &&
          col("purchase_ms") <= col("view_ms") + W)
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          col("view_ms"), col("purchase_ms"),
          (col("purchase_ms") - col("view_ms")).as("lag_ms"))
        .transform(Det.sortAll)
    },
    Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
            |       epoch_ms(v.ts) AS view_ms, epoch_ms(p.ts) AS purchase_ms,
            |       epoch_ms(p.ts) - epoch_ms(v.ts) AS lag_ms
            |FROM (SELECT * FROM events WHERE event_type <> 'purchase') v
            |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
            |  ON v.user_id = p.user_id
            | AND epoch_ms(p.ts) >= epoch_ms(v.ts)
            | AND epoch_ms(p.ts) <= epoch_ms(v.ts) + 1800000
            |ORDER BY ALL""".stripMargin)
  )

  /** F. SCD2 (slowly-changing-dimension type 2) build from the event
    * stream — the warehouse CDC shape every mart layer needs: each user's
    * `event_type` is the tracked attribute, and the output is one
    * validity interval per attribute RUN — change-capture (drop
    * consecutive repeats), versioned, with half-open [valid_from,
    * valid_to) intervals chained so each version's end is the next
    * version's start. The open (current) interval carries the standard
    * warehouse high-date sentinel instead of NULL — 253402300800000 ms =
    * 9999-01-01 — so the output is total-order sortable on both engines
    * (Spark sorts nulls first, DuckDB last; a NULL valid_to would break
    * the hash gate's shared row order).
    *
    * Plan shape: every window is keyed by user_id — the q_sessionize
    * class. Per-key state is O(1) (lag/running-sum stream through each
    * timeline once), partitions split across users, and the second pass
    * (valid_to via lead) runs on the RUN-level frame, already collapsed
    * to ≤ changes-per-user rows — both Exchanges carry narrow rows and
    * AQE-coalesce. A hot user bounds a partition at its own event count,
    * same bound q_sessionize documents; there is no corpus-global window.
    */
  val scd2: Q = Q(
    "q_scd2",
    (s, d) => {
      val highDate = 253402300800000L // 9999-01-01T00:00:00Z epoch ms
      val e = T.events(s, d).select(
        col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"), col("event_type"))
      val wOrder = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val wRun = wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = e
        .withColumn("prev_type", lag(col("event_type"), 1).over(wOrder))
        .withColumn("is_change",
          when(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("version", sum(col("is_change")).over(wRun))
        .groupBy("user_id", "version")
        .agg(min(col("event_type")).as("status"), // constant within a run
          min(col("ts_ms")).as("valid_from_ms"),
          count(lit(1)).as("n_events"))
      val wVer = Window.partitionBy("user_id").orderBy("version")
      runs
        .withColumn("valid_to_ms",
          coalesce(lead(col("valid_from_ms"), 1).over(wVer), lit(highDate)))
        .withColumn("is_current", col("valid_to_ms") === highDate)
        .transform(Det.sortAll)
    },
    Some("""WITH t AS (
            |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
            |         lag(event_type) OVER (PARTITION BY user_id
            |           ORDER BY epoch_ms(ts), event_id) AS prev_type
            |  FROM events
            |), f AS (
            |  SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
            |                 THEN 1 ELSE 0 END AS is_change
            |  FROM t
            |), v AS (
            |  SELECT *, CAST(SUM(is_change) OVER (PARTITION BY user_id
            |              ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING)
            |            AS BIGINT) AS version
            |  FROM f
            |), runs AS (
            |  SELECT user_id, version, MIN(event_type) AS status,
            |         MIN(ts_ms) AS valid_from_ms, COUNT(*) AS n_events
            |  FROM v GROUP BY 1, 2
            |)
            |SELECT user_id, version, status, valid_from_ms, n_events,
            |       COALESCE(lead(valid_from_ms) OVER (PARTITION BY user_id
            |         ORDER BY version), 253402300800000) AS valid_to_ms,
            |       COALESCE(lead(valid_from_ms) OVER (PARTITION BY user_id
            |         ORDER BY version), 253402300800000) = 253402300800000 AS is_current
            |FROM runs ORDER BY ALL""".stripMargin)
  )

  /** F. Semi-structured JSON extraction (`events.props`) — the
    * schema-on-read surface every event pipeline needs: parse the JSON
    * payload with an EXPLICIT schema via from_json (JsonToStructs — a
    * narrow codegen'd expression; never schema INFERENCE, which is a
    * whole extra corpus scan at 100 TB just to guess what you already
    * know), then aggregate typed fields per event type. PERMISSIVE
    * malformed-row handling surfaces as a counted `n_bad` column instead
    * of a query failure — at web scale some payloads are always garbage
    * and dropping them silently hides producer bugs. Plan: parse +
    * extract ride the scan projection; ONE map-side-combined groupBy to
    * an event-type-sized frame; raw JSON never shuffles. Aggregates stay
    * exact integers (graft.Num rules).
    */
  val jsonExtract: Q = Q(
    "q_json_extract",
    (s, d) => {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.LongType)
      T.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
          sum(coalesce(col("k"), lit(0L))).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("k_over_50"))
        .transform(Det.sortAll)
    },
    Some("""WITH t AS (
            |  SELECT event_type,
            |         CASE WHEN json_valid(props)
            |              THEN TRY_CAST(props->>'k' AS BIGINT) END AS k
            |  FROM events
            |)
            |SELECT event_type, COUNT(*) AS n,
            |       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
            |       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS k_sum,
            |       MIN(k) AS k_min, MAX(k) AS k_max,
            |       CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS k_over_50
            |FROM t GROUP BY 1 ORDER BY ALL""".stripMargin)
  )

  /** F. Keep-newest compaction (r8) — the snapshot/log-compaction shape
    * (Kafka compacted topics, CommonCrawl newest-capture-per-URL, CDC
    * snapshot reads): per (user_id, event_type) key, the LATEST record by
    * (ts, event_id) plus how many versions it superseded.
    *
    * The scale device is max(struct(ts, event_id, payload...)) in ONE
    * map-side-combinable groupBy — O(1) state per key, partial-aggregated
    * before the single Exchange, AQE-splittable. The naive encoding
    * (row_number over the key, keep rn=1) buffers and sorts every key's
    * full version history on one task — for a compaction workload the
    * hot key IS the point (a frequently-updated row has millions of
    * versions at CDC scale), so the window form is exactly the
    * unsplittable-task trap the dedup family's keeper device avoids.
    * Struct max is lexicographic and (ts, event_id) is a total key
    * (event_id unique), so the payload fields behind it never decide —
    * the result is deterministic on any partitioning.
    */
  val keepNewest: Q = Q(
    "q_keep_newest",
    (s, d) =>
      T.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000000").as("ts_ms"), col("event_id"),
          Num.cents(col("value")).as("value_cents"))
        .groupBy("user_id", "event_type")
        .agg(max(struct(col("ts_ms"), col("event_id"), col("value_cents"))).as("w"),
          count(lit(1)).as("n_versions"))
        .select(col("user_id"), col("event_type"),
          col("w.ts_ms").as("ts_ms"), col("w.event_id").as("event_id"),
          col("w.value_cents").as("value_cents"), col("n_versions"))
        .transform(Det.sortAll),
    Some("""WITH t AS (
            |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
            |         CAST(ROUND(value*100,0) AS BIGINT) AS value_cents,
            |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            |           ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn,
            |         COUNT(*) OVER (PARTITION BY user_id, event_type) AS nv
            |  FROM events
            |)
            |SELECT user_id, event_type, ts_ms, event_id, value_cents,
            |       CAST(nv AS BIGINT) AS n_versions
            |FROM t WHERE rn = 1 ORDER BY ALL""".stripMargin)
  )

  /** F. Per-key outlier detection (r8) — the monitoring / data-quality
    * anomaly flag: events whose value sits more than 3σ from their own
    * user's mean. The entire test runs in EXACT integer arithmetic: the
    * z-score inequality |x − S/n| > 3·√(SS/n − S²/n²) is cleared of the
    * division and the square root by multiplying through by n² —
    *   (n·x − S)² > 9·(n·SS − S²)
    * with S = Σcents, SS = Σcents² — so there is not a single double in
    * the operator and the flag is bit-deterministic on any cluster (a
    * float mean/stddev would be partial-aggregation-order-dependent, the
    * exact thing graft.Num bans). DECIMAL(38,0) carries the products:
    * long would silently wrap once a key holds ~10⁶ events of ~10⁵
    * cents (n·SS ≈ 10²², past 2⁶³), and Spark's non-ANSI long multiply
    * wraps without error — decimal overflows loudly at 38 digits, far
    * past any physical corpus.
    *
    * Plan: per-user moments via ONE map-side-combinable groupBy (3
    * exact sums), joined back on user_id — the dedup keeper device, AQE
    * skew-splittable; NOT a window over user_id, where a bot key would
    * buffer its whole history on one task. Population variance (÷n, not
    * n−1): the user's own events are the whole population under test.
    */
  val anomaly: Q = Q(
    "q_anomaly",
    (s, d) => {
      val dec = "decimal(38,0)"
      val e = T.events(s, d).select(
        col("user_id"), col("event_id"),
        Num.cents(col("value")).as("cents"))
      val moments = e.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(col("cents").cast(dec)).cast(dec).as("sm"),
        sum((col("cents").cast(dec) * col("cents").cast(dec))).cast(dec).as("ss"))
      e.join(moments, "user_id")
        .select(col("user_id"), col("event_id"), col("cents"), col("n"),
          ((col("n").cast(dec) * col("cents").cast(dec) - col("sm")) *
            (col("n").cast(dec) * col("cents").cast(dec) - col("sm")) >
            lit(9).cast(dec) *
              (col("n").cast(dec) * col("ss") - col("sm") * col("sm")))
            .as("is_outlier"))
        .transform(Det.sortAll)
    },
    Some("""WITH e AS (
            |  SELECT user_id, event_id,
            |         CAST(ROUND(value*100,0) AS BIGINT) AS cents
            |  FROM events
            |), m AS (
            |  SELECT user_id, COUNT(*) AS n,
            |         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sm,
            |         CAST(SUM(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss
            |  FROM e GROUP BY 1
            |)
            |SELECT e.user_id, e.event_id, e.cents, m.n,
            |       (CAST(m.n AS DECIMAL(38,0)) * CAST(e.cents AS DECIMAL(38,0)) - m.sm) *
            |         (CAST(m.n AS DECIMAL(38,0)) * CAST(e.cents AS DECIMAL(38,0)) - m.sm) >
            |         CAST(9 AS DECIMAL(38,0)) *
            |           (CAST(m.n AS DECIMAL(38,0)) * m.ss - m.sm * m.sm) AS is_outlier
            |FROM e JOIN m USING (user_id)
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Ordered conversion funnel (r8) — the ClickHouse `windowFunnel` /
    * product-analytics shape: per user, how deep the ordered sequence
    * view → click → purchase progresses, with every step inside a 7-day
    * window anchored at the FIRST step. Depth-k requires a step-k event
    * strictly after the step-(k−1) time.
    *
    * The scale device: the funnel is ITERATED MIN-JOINS — one map-side-
    * combinable groupBy per step (min qualifying timestamp) chained
    * through user-keyed equi-joins — NOT a per-user ordered fold over
    * collect_list (a bot user's millions of events would buffer in one
    * aggregation state; the joins keep every stage AQE-splittable and
    * O(1)-state). Absent steps surface as 0-sentinels, not NULLs — the
    * Spark-nulls-first / DuckDB-nulls-last sort divergence (the q_scd2
    * rule) never enters the gate.
    */
  val windowFunnel: Q = Q(
    "q_window_funnel",
    (s, d) => {
      val W = 604800000L // 7 days in ms
      val e = T.events(s, d).select(col("user_id"), col("event_type"),
        expr("ts div 1000000").as("ms"))
      val s1 = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ms").as("t1"))
      val s2 = e.where(col("event_type") === "click")
        .join(s1, "user_id")
        .where(col("ms") > col("t1") && col("ms") <= col("t1") + W)
        .groupBy("user_id").agg(min("ms").as("t2"), min("t1").as("t1w"))
      val s3 = e.where(col("event_type") === "purchase")
        .join(s2, "user_id")
        .where(col("ms") > col("t2") && col("ms") <= col("t1w") + W)
        .groupBy("user_id").agg(min("ms").as("t3"))
      s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"),
          coalesce(col("t2"), lit(0L)).as("t2_ms"),
          coalesce(col("t3"), lit(0L)).as("t3_ms"),
          when(col("t3").isNotNull, 3L)
            .when(col("t2").isNotNull, 2L).otherwise(1L).as("depth"))
        .transform(Det.sortAll)
    },
    Some("""WITH e AS (
            |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
            |), s1 AS (
            |  SELECT user_id, min(ms) AS t1 FROM e
            |  WHERE event_type = 'view' GROUP BY 1
            |), s2 AS (
            |  SELECT e.user_id, min(e.ms) AS t2, min(s1.t1) AS t1w
            |  FROM e JOIN s1 USING (user_id)
            |  WHERE e.event_type = 'click' AND e.ms > s1.t1
            |    AND e.ms <= s1.t1 + 604800000
            |  GROUP BY 1
            |), s3 AS (
            |  SELECT e.user_id, min(e.ms) AS t3
            |  FROM e JOIN s2 USING (user_id)
            |  WHERE e.event_type = 'purchase' AND e.ms > s2.t2
            |    AND e.ms <= s2.t1w + 604800000
            |  GROUP BY 1
            |)
            |SELECT s1.user_id, s1.t1,
            |       COALESCE(s2.t2, 0) AS t2_ms, COALESCE(s3.t3, 0) AS t3_ms,
            |       CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
            |                 WHEN s2.t2 IS NOT NULL THEN 2
            |                 ELSE 1 END AS BIGINT) AS depth
            |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Cohort retention (r8) — the other standard product-analytics
    * rollup: users cohorted by first-activity week, the retention matrix
    * counts who returns k weeks later. Week indexes are exact integer
    * floor-divisions of epoch days (engine-neutral — no date-truncation
    * semantics in the gate); the rate is one IEEE division of exact
    * counts. Plan: first-activity groupBy, distinct (user, week)
    * activity (both map-side combined, user-keyed — the only
    * corpus-sized shuffles), then matrix-sized aggregation; cohort sizes
    * broadcast back. Output is cohort×offset-sized, independent of the
    * corpus.
    */
  val retention: Q = Q(
    "q_retention",
    (s, d) => {
      val e = T.events(s, d).select(col("user_id"),
        expr("((ts div 1000000) div 86400000) div 7").as("week"))
      val cohorts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
      val sizes = cohorts.groupBy("cohort_week")
        .agg(count(lit(1)).as("cohort_size"))
      val active = e.distinct()
      active.join(cohorts, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("active_users"))
        .join(broadcast(sizes), "cohort_week")
        .withColumn("retention_rate",
          col("active_users").cast("double") / col("cohort_size").cast("double"))
        .select("cohort_week", "week_offset", "active_users", "cohort_size",
          "retention_rate")
        .transform(Det.sortAll)
    },
    Some("""WITH e AS (
            |  SELECT user_id, (epoch_ms(ts) // 86400000) // 7 AS week FROM events
            |), c AS (
            |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
            |), sz AS (
            |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
            |  FROM c GROUP BY 1
            |), a AS (
            |  SELECT DISTINCT user_id, week FROM e
            |), m AS (
            |  SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
            |         CAST(count(*) AS BIGINT) AS active_users
            |  FROM a JOIN c USING (user_id) GROUP BY 1, 2
            |)
            |SELECT m.cohort_week, m.week_offset, m.active_users, sz.cohort_size,
            |       CAST(m.active_users AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
            |         AS retention_rate
            |FROM m JOIN sz USING (cohort_week)
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Timezone-local calendar rollup (late-r8) — the reference runs its
    * date logic in a NAMED zone, not UTC (dbt_project.yml:36,
    * `'dbt_date:time_zone': 'America/Los_Angeles'`): per LA-local
    * calendar date × event type, counts and exact cent mass. The UTC
    * instant → zoned local-date step is the classic reporting hazard —
    * an 8-hour offset moves every late-evening event to a different
    * business day than a UTC rollup, and DST transitions make the
    * mapping non-arithmetic (a fixed-offset shortcut breaks twice a
    * year; the spec pins the spring-forward gap). Both engines resolve
    * the SAME IANA rules, so the local date is engine-neutral; the
    * instant truncates to whole epoch seconds on both sides first
    * (sub-second precision cannot move a date boundary). One map-side-
    * combined groupBy over a narrow projection; date×type-sized output.
    */
  /** The zone-parameterized rollup core: the reference's time_zone is a
    * dbt VAR (`dbt_project.yml:36`), not a constant, so the engine
    * threads any IANA id — the registered query pins the reference's
    * default; the spec additionally drives a southern-hemisphere zone
    * (opposite DST sense) through the same plan.
    */
  private[graft] def tzRollupIn(s: SparkSession, d: String,
      zone: String): DataFrame = {
    val localTs = from_utc_timestamp(
      timestamp_seconds(expr("ts div 1000000000")), zone)
    T.events(s, d)
      .select(date_format(localTs, "yyyy-MM-dd").as("local_date"),
        col("event_type"), Num.cents(col("value")).as("cents"))
      .groupBy("local_date", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("value_cents"))
      .transform(Det.sortAll)
  }

  val tzRollup: Q = Q(
    "q_tz_rollup",
    (s, d) => tzRollupIn(s, d, "America/Los_Angeles"),
    Some("""SELECT strftime(timezone('America/Los_Angeles',
            |         to_timestamp(epoch_ms(ts) // 1000)), '%Y-%m-%d') AS local_date,
            |       event_type,
            |       CAST(COUNT(*) AS BIGINT) AS n_events,
            |       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
            |FROM events
            |GROUP BY 1, 2
            |ORDER BY ALL""".stripMargin)
  )

  /** F. Rolling time-RANGE window aggregation (r10) — per user, at every
    * event, the trailing-7-day event count, exact cent mass and IEEE mean:
    * the moving-baseline shape behind rate limiting, spend monitoring and
    * per-entity anomaly baselines (q_anomaly's global z-test has no
    * per-event trailing view; this is it). A RANGE frame, not ROWS: the
    * frame is defined by the TIME span [ts−7d, ts], so rows sharing a
    * timestamp are peers on both engines and the result is independent of
    * tie order — a ROWS frame over a non-unique ordering would be
    * engine-ambiguous and could never hash-match.
    *
    * Cross-engine exactness: the frame key is integer epoch millis (the
    * events axis normalized by T.events), the sum is exact integer cents,
    * and the mean is ONE IEEE division of exact ints — the Num rules.
    *
    * Scale: one shuffle by user_id; each user's timeline streams through
    * the window operator with running-frame state (Spark's range-frame
    * implementation keeps a sliding buffer bounded by the 7-day span).
    * The per-user partition is the sessionize class — a bot user's
    * history sorts on one spillable task; the streaming twins bound that
    * axis, and keys here are real user ids, not content keys (no
    * mass-duplicate magnet).
    */
  val rollingStats: Q = Q(
    "q_rolling_stats",
    (s, d) => {
      val e = T.events(s, d).select(
        col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ts_ms"),
        Num.cents(col("value")).as("value_cents"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"))
        .rangeBetween(-604800000L, 0L)
      e.withColumn("roll_events", count(lit(1)).over(w).cast("long"))
        .withColumn("roll_value_cents", sum(col("value_cents")).over(w))
        .withColumn("roll_avg_cents",
          col("roll_value_cents").cast("double") / col("roll_events").cast("double"))
        .transform(Det.sortAll)
    },
    Some("""SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
            |       CAST(ROUND(value*100,0) AS BIGINT) AS value_cents,
            |       CAST(COUNT(*) OVER w AS BIGINT) AS roll_events,
            |       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) OVER w AS BIGINT)
            |         AS roll_value_cents,
            |       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) OVER w AS DOUBLE) /
            |         CAST(COUNT(*) OVER w AS DOUBLE) AS roll_avg_cents
            |FROM events
            |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
            |             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
            |ORDER BY ALL""".stripMargin)
  )

  val all: Seq[Q] = Seq(windowEvents, sessionize, rangeJoin, scd2, jsonExtract,
    keepNewest, anomaly, windowFunnel, retention, tzRollup, rollingStats)
}

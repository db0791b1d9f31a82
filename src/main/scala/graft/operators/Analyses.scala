package graft.operators

import org.apache.spark.sql.functions._
import graft.{Det, Num, Q, T}

/** The reference's dbt analyses as engine operators.
  *
  * Reference shapes:
  *  - group/count/order desc: dbt/analyses/youtube/most_saved_channels.sql
  *  - HAVING count>1 + membership string_agg:
  *    dbt/analyses/youtube/videos_saved_more_than_once.sql
  *  - CASE buckets × section counts: dbt/analyses/youtube/youtube_statistics.sql
  *  - grouped counts: dbt/analyses/spotify/found_by_statistics.sql,
  *    found_on_try_statistics.sql
  *  - join-ratio with round: dbt/analyses/spotify/ratio_of_found_by_playlists.sql
  *  - HAVING + ordered string_agg of links/statuses:
  *    dbt/analyses/spotify/skipped_during_the_run.sql
  */
object Analyses {

  /** D. group / count / order desc (most_saved_channels). */
  val topGroups: Q = Q(
    "q_top_groups",
    (s, d) =>
      T.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("members"))
        .transform(Det.sortAll),
    Some("""SELECT c_mktsegment, COUNT(*) AS members
            |FROM customer GROUP BY c_mktsegment
            |ORDER BY ALL""".stripMargin)
  )

  /** D. duplicate-membership finder: HAVING count>1, synthesized link,
    * sorted-distinct membership list (videos_saved_more_than_once).
    */
  val dupMembership: Q = Q(
    "q_dup_membership",
    (s, d) => {
      val l = T.lineitem(s, d)
      val o = T.orders(s, d)
      val p = T.part(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(p("p_partkey"), p("p_name"))
        .agg(count(lit(1)).as("section_cnt"),
          array_join(array_sort(collect_set(o("o_orderpriority"))), "; ").as("sections"))
        .where(col("section_cnt") > 1)
        .select(
          col("p_name"),
          concat(lit("https://item/"), col("p_partkey").cast("string")).as("link"),
          col("section_cnt"), col("sections"))
        .transform(Det.sortAll)
    },
    Some("""SELECT p.p_name,
            |       'https://item/' || CAST(p.p_partkey AS VARCHAR) AS link,
            |       COUNT(*) AS section_cnt,
            |       array_to_string(list_sort(list(DISTINCT o.o_orderpriority)), '; ') AS sections
            |FROM lineitem l
            |JOIN orders o ON l.l_orderkey = o.o_orderkey
            |JOIN part p   ON l.l_partkey = p.p_partkey
            |GROUP BY p.p_partkey, p.p_name
            |HAVING COUNT(*) > 1
            |ORDER BY ALL""".stripMargin)
  )

  /** D. CASE buckets × section counts (youtube_statistics). */
  val caseStats: Q = Q(
    "q_case_stats",
    (s, d) =>
      T.orders(s, d)
        .select(
          when(col("o_totalprice") < 200000.0, "Track")
            .otherwise("Album/Playlist").as("estimated_type"),
          when(col("o_orderpriority") === "1-URGENT", "In liked videos")
            .otherwise("In playlists").as("section"))
        .groupBy("estimated_type", "section")
        .agg(count(lit(1)).as("total_records"))
        .transform(Det.sortAll),
    Some("""SELECT CASE WHEN o_totalprice < 200000.0 THEN 'Track'
            |            ELSE 'Album/Playlist' END AS estimated_type,
            |       CASE WHEN o_orderpriority = '1-URGENT' THEN 'In liked videos'
            |            ELSE 'In playlists' END AS section,
            |       COUNT(*) AS total_records
            |FROM orders
            |GROUP BY 1, 2
            |ORDER BY ALL""".stripMargin)
  )

  /** D. two-level grouped counts (found_by / found_on_try statistics). */
  val groupCounts: Q = Q(
    "q_group_counts",
    (s, d) =>
      T.orders(s, d)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("records_found"))
        .transform(Det.sortAll),
    Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS records_found
            |FROM orders GROUP BY 1, 2
            |ORDER BY ALL""".stripMargin)
  )

  /** D. inner+left join found/total ratio (ratio_of_found_by_playlists:
    * `round(count(sl.log_id) * 100 / count(yl.id), 2)`). The ratio is IEEE
    * division of two exact counts — identical on every engine.
    */
  val ratioJoin: Q = Q(
    "q_ratio_join",
    (s, d) => {
      val c = T.customer(s, d)
      val o = T.orders(s, d)
      val m = T.lineitem(s, d).select("l_orderkey").distinct()
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(m, o("o_orderkey") === m("l_orderkey"), "left")
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(count(m("l_orderkey")).as("found_orders"),
          count(lit(1)).as("total_orders"))
        .withColumn("percentage_found",
          round(col("found_orders") * lit(100.0) / col("total_orders"), 2))
        .transform(Det.sortAll)
    },
    Some("""WITH g AS (
            |  SELECT c.c_custkey, c.c_name,
            |         COUNT(m.l_orderkey) AS found_orders,
            |         COUNT(*) AS total_orders
            |  FROM customer c
            |  JOIN orders o ON c.c_custkey = o.o_custkey
            |  LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) m
            |         ON o.o_orderkey = m.l_orderkey
            |  GROUP BY c.c_custkey, c.c_name
            |)
            |SELECT c_custkey, c_name, found_orders, total_orders,
            |       ROUND(found_orders * CAST(100 AS DOUBLE) / total_orders, 2) AS percentage_found
            |FROM g ORDER BY ALL""".stripMargin)
  )

  /** D. HAVING + ordered string_agg of synthesized links and statuses
    * (skipped_during_the_run: `string_agg('https://…'||video_id, '\n'
    * order by log_id)`). Ordered-collect is expressed as
    * sort-array-of-structs → project — pure codegen'd catalyst exprs, no UDF.
    */
  val havingAgg: Q = Q(
    "q_having_agg",
    (s, d) => {
      // r16: T.spread measured and REJECTED here (same verdict as
      // q_found_agg): collect_list partials do not combine, so the
      // 32-way fan-out multiplied aggregation-buffer allocation for no
      // exchange reduction — wall 1.27→1.95 s, cpuSec 2.1→14.8 at sf0.1
      val l = T.lineitem(s, d)
      val o = T.orders(s, d)
      // The link/status strings RENDER AFTER the aggregation (r14): the
      // collected structs carry only what the sort semantics need — the
      // partkey DIGIT string (1-7 chars; l_linenumber is NOT unique per
      // order in this corpus, so for equal line numbers the old
      // struct(lineno, link) order was decided by the link string, i.e.
      // by the partkey rendered as text — the constant prefix never
      // discriminates) and the 1-char return flag (for equal line
      // numbers the old status string "lineno flag" shares its prefix,
      // so flag alone decides). Per input row the shuffle and the
      // per-group collect buffers shed the ~19-char link prefix and the
      // rendered status — a multi-GB cut at 100× for a byte-identical
      // output (the hash gate proves it).
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .where(o("o_orderstatus") === "F")
        .select(o("o_orderkey"), o("o_orderpriority"), l("l_linenumber"),
          l("l_partkey").cast("string").as("pk"), l("l_returnflag"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("video_cnt"),
          expr("array_join(transform(array_sort(collect_list(struct(l_linenumber, pk)))," +
            " x -> concat('https://item/', x.pk)), '; ')").as("links"),
          expr("array_join(transform(array_sort(collect_list(struct(l_linenumber, l_returnflag)))," +
            " x -> concat(CAST(x.l_linenumber AS STRING), ' ', x.l_returnflag)), '; ')").as("statuses"))
        .where(col("video_cnt") > 1)
        .transform(Det.sortAll)
    },
    Some("""SELECT o.o_orderkey, o.o_orderpriority,
            |       COUNT(*) AS video_cnt,
            |       string_agg('https://item/' || CAST(l.l_partkey AS VARCHAR), '; '
            |                  ORDER BY l.l_linenumber, 'https://item/' || CAST(l.l_partkey AS VARCHAR)) AS links,
            |       string_agg(CAST(l.l_linenumber AS VARCHAR) || ' ' || l.l_returnflag, '; '
            |                  ORDER BY l.l_linenumber, CAST(l.l_linenumber AS VARCHAR) || ' ' || l.l_returnflag) AS statuses
            |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |WHERE o.o_orderstatus = 'F'
            |GROUP BY o.o_orderkey, o.o_orderpriority
            |HAVING COUNT(*) > 1
            |ORDER BY ALL""".stripMargin)
  )

  val all: Seq[Q] = Seq(topGroups, dupMembership, caseStats, groupCounts,
    ratioJoin, havingAgg)
}

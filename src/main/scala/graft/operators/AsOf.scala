package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Num, Q, T}

/** As-of join: for each left row, the latest right row with
  * rightTs <= leftTs on the same key.
  *
  * Spark has no native as-of operator; the classic scalable encoding is
  * union-the-streams + running `last(_, ignoreNulls)` window:
  * one shuffle on (key), no range explosion, no per-key collect — the same
  * plan shape survives a 100 TB event log (each key's timeline is processed
  * once, in timestamp order, streaming through the window operator).
  *
  * The reference's closest-candidate duration matching
  * (dags/scripts/spotify_elt.py:287-303) is the tolerance-window cousin of
  * this operator; DuckDB's native ASOF JOIN is the oracle.
  */
object AsOf {

  /** Generic as-of-latest: carry `carry` columns from the right side onto
    * each left row. Right rows sort before left rows at equal timestamps
    * (inclusive <= semantics).
    */
  def asofLatest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: Column,
      rightTs: Column,
      carry: Seq[String]): DataFrame = {
    val r = right.select(col(key), rightTs.as("__ts"), lit(0).as("__tag"),
      struct(carry.map(col).toIndexedSeq: _*).as("__carry"))
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__tag", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__tag"), col("__carry"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__matched", last(col("__carry"), ignoreNulls = true).over(w))
    val matchedFields = carry.map(c => col("__matched").getField(c).as(s"matched_$c"))
    carried.where(col("__tag") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ matchedFields: _*)
  }

  /** F. Self as-of over the event log: each non-purchase event is joined to
    * the same user's latest preceding-or-equal purchase.
    */
  val asofJoin: Q = Q(
    "q_asof_join",
    (s, d) => {
      val e = T.events(s, d)
      val leftSide = e.where(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000").as("ts_ms"), col("event_type"),
          Num.cents(col("value")).as("value_cents"))
      val rightSide = e.where(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000000").as("p_ts_ms"),
          col("event_id").as("p_event_id"),
          Num.cents(col("value")).as("p_value_cents"))
      asofLatest(leftSide, rightSide, "user_id",
        col("ts_ms"), col("p_ts_ms"), Seq("p_ts_ms", "p_event_id", "p_value_cents"))
        .transform(Det.sortAll)
    },
    Some("""SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms, e.event_type,
            |       CAST(ROUND(e.value*100,0) AS BIGINT) AS value_cents,
            |       epoch_ms(p.ts) AS matched_p_ts_ms,
            |       p.event_id AS matched_p_event_id,
            |       CAST(ROUND(p.value*100,0) AS BIGINT) AS matched_p_value_cents
            |FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
            |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
            |  ON e.user_id = p.user_id AND p.ts <= e.ts
            |ORDER BY ALL""".stripMargin)
  )

  val all: Seq[Q] = Seq(asofJoin)
}

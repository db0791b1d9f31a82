package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.T

/** Per-table staging layer — the reference's dbt staging models
  * (dbt/models/staging/stg__*.sql: one column-pruned view per source
  * table) re-expressed as lazy DataFrames. Nothing is materialized: each
  * staging view is a projection whose column list (plus any consumer
  * predicate) reaches the parquet scan, so downstream models read only
  * what they use — ReadSchema/PushedFilters are asserted in
  * ExtensionsAndDagSpec. All ten driver tables get a view, mirroring the
  * reference's ten staging models.
  */
object Staging {

  /** stg__youtube_library analog: the membership fact, keys + measures. */
  def lineitem(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
      "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate")

  /** stg__spotify_log analog: the per-item search log. */
  def orders(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")

  /** stg__youtube_playlists analog: ownership dim (no acctbal). */
  def customer(s: SparkSession, d: String): DataFrame =
    T.customer(s, d).select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  /** stg__spotify_playlists analog (no acctbal). */
  def supplier(s: SparkSession, d: String): DataFrame =
    T.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")

  /** stg__youtube_videos analog: item dim. */
  def part(s: SparkSession, d: String): DataFrame =
    T.part(s, d).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")

  /** stg__search_types analog: tiny enum dims. */
  def nation(s: SparkSession, d: String): DataFrame =
    T.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")

  def region(s: SparkSession, d: String): DataFrame =
    T.region(s, d).select("r_regionkey", "r_name")

  /** stg__playlist_ids analog over the stream table: ids + event time. */
  def events(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select("event_id", "ts", "user_id", "event_type", "value")

  def documents(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select("doc_id", "text", "lang", "source")

  def embeddings(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d).select("vec_id", "embedding")

  val names: Seq[String] = Seq("stg_lineitem", "stg_orders", "stg_customer",
    "stg_supplier", "stg_part", "stg_nation", "stg_region", "stg_events",
    "stg_documents", "stg_embeddings")

  def byName(name: String, d: String): SparkSession => DataFrame = name match {
    case "stg_lineitem"   => s => lineitem(s, d)
    case "stg_orders"     => s => orders(s, d)
    case "stg_customer"   => s => customer(s, d)
    case "stg_supplier"   => s => supplier(s, d)
    case "stg_part"       => s => part(s, d)
    case "stg_nation"     => s => nation(s, d)
    case "stg_region"     => s => region(s, d)
    case "stg_events"     => s => events(s, d)
    case "stg_documents"  => s => documents(s, d)
    case "stg_embeddings" => s => embeddings(s, d)
  }
}

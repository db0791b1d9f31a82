package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization and parsing column functions. Everything here is a
  * composition of built-in Catalyst expressions (regexp_*, string ops) —
  * fully codegen'd, no UDFs, scales as a narrow map.
  */
object Text {

  /** The reference's title-normalization chain
    * (dags/scripts/spotify_elt.py:160-212 `fix_title`): strip bracketed
    * segments, ` -…- ` spans, pipes, colons→space, standalone OST, years,
    * "Full Album" (case-insensitive); collapse whitespace, trim, lower.
    */
  def normalizeTitle(c: Column): Column = {
    val t1 = regexp_replace(c, "(\\((.*?)\\)|\\[(.*?)\\])", "")
    val t2 = regexp_replace(t1, "( -)(.*?)(- )", " ")
    val t3 = regexp_replace(t2, "\\|", "")
    val t4 = regexp_replace(t3, ":", " ")
    val t5 = regexp_replace(t4, "\\bOST\\b", " ")
    val t6 = regexp_replace(t5, "\\b(19|20)\\d{2}\\b", "")
    val t7 = regexp_replace(t6, "(?i)Full Album", "")
    lower(trim(regexp_replace(t7, " +", " ")))
  }

  /** ISO-8601 time-duration → milliseconds (the Spark-native equivalent of
    * the reference's aniso8601 parse, dags/scripts/youtube_elt.py).
    * Handles PTnHnMnS with any component optional.
    */
  def iso8601Ms(c: Column): Column = {
    def comp(unit: String): Column =
      coalesce(nullif(regexp_extract(c, "(\\d+)" + unit, 1), lit("")).cast("long"), lit(0L))
    (comp("H") * 3600L + comp("M") * 60L + comp("S")) * 1000L
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization and parsing column functions. Everything here is a
  * composition of built-in Catalyst expressions (regexp_*, string ops) —
  * fully codegen'd, no UDFs, scales as a narrow map.
  */
object Text {

  /** The reference's title-cleaning chain, full fidelity
    * (dags/scripts/spotify_elt.py:159-212 `fix_title`), nine steps in
    * reference order:
    *   1. strip bracketed segments incl. the CJK 【…】 class
    *   2. strip ` -…- ` dash-divider spans
    *   3. drop pipes   4. colons → space   5. ‘ → '
    *   6. drop dashes not between word characters (\B-\B)
    *   7. drop standalone OST   8. drop a 19xx/20xx year
    *   9. drop "Full Album" (case-insensitive)
    * After EVERY step the reference checks "if nothing left, undo": a step
    * that empties the title resets it to the ORIGINAL input (not the
    * previous step), and the chain continues from there — so "(2021)"
    * becomes "()" (step 1 undone, year stripped later) rather than "".
    */
  def fixTitle(c: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      t => regexp_replace(t, "(\\((.*?)\\)|\\[(.*?)\\]|【(.*?)】)", ""),
      t => regexp_replace(t, "( -)(.*?)(- )", " "),
      t => regexp_replace(t, "\\|", ""),
      t => regexp_replace(t, ":", " "),
      t => regexp_replace(t, "‘", "'"),
      t => regexp_replace(t, "\\B-\\B", ""),
      t => regexp_replace(t, "\\bOST\\b", " "),
      t => regexp_replace(t, "\\b(19|20)\\d{2}\\b", ""),
      t => regexp_replace(t, "(?i)Full Album", ""))
    steps.foldLeft(c)((acc, f) => {
      val stepped = f(acc)
      when(trim(stepped) === "", c).otherwise(stepped)
    })
  }

  /** fixTitle plus graft's search canonicalization (collapse whitespace,
    * trim, lower) — the form downstream substring matching runs on.
    */
  def normalizeTitle(c: Column): Column =
    lower(trim(regexp_replace(fixTitle(c), " +", " ")))

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

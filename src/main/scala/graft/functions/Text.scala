package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-normalization and parsing column functions. Everything here is a
  * composition of built-in Catalyst expressions (regexp_*, string ops) —
  * fully codegen'd, no UDFs, scales as a narrow map.
  */
object Text {

  /** The reference's title-cleaning steps, full fidelity
    * (dags/scripts/spotify_elt.py:159-212 `fix_title`), in reference order:
    *   1. strip bracketed segments incl. the CJK 【…】 class
    *   2. strip ` -…- ` dash-divider spans
    *   3. drop pipes   4. colons → space   5. ‘ → '
    *   6. drop dashes not between word characters (\B-\B)
    *   7. drop standalone OST   8. drop a 19xx/20xx year
    *   9. drop "Full Album" (case-insensitive)
    */
  private val fixTitleSteps: Seq[Column => Column] = Seq(
    t => regexp_replace(t, "(\\((.*?)\\)|\\[(.*?)\\]|【(.*?)】)", ""),
    t => regexp_replace(t, "( -)(.*?)(- )", " "),
    t => regexp_replace(t, "\\|", ""),
    t => regexp_replace(t, ":", " "),
    t => regexp_replace(t, "‘", "'"),
    t => regexp_replace(t, "\\B-\\B", ""),
    t => regexp_replace(t, "\\bOST\\b", " "),
    t => regexp_replace(t, "\\b(19|20)\\d{2}\\b", ""),
    t => regexp_replace(t, "(?i)Full Album", ""))

  /** Apply the fix_title chain to `raw`, adding `fixedOut` (the reference-
    * faithful cleaned title) and `normOut` (graft's lower/collapse search
    * canonical form).
    *
    * After EVERY step the reference checks "if nothing left, undo": a step
    * that empties the title resets it to the ORIGINAL input (not the
    * previous step), and the chain continues from there — so "(2021)"
    * becomes "()" (step 1 undone, year stripped later) rather than "".
    *
    * Deliberately a DataFrame transform, not a Column → Column function:
    * the undo-guard references each step's result twice (in the emptiness
    * test and as the carried value), so a pure Column fold doubles the
    * expression tree per step — 2⁹ copies of the regex chain by step 9,
    * which blows codegen past the JIT limit and collapses to interpreted
    * eval (measured: 226 s at sf0.1 vs ~1 s for this form). Materializing
    * every step as a named attribute in its own projection evaluates each
    * regex exactly once per row; Catalyst's CollapseProject keeps the
    * projections separate precisely because the twice-referenced step
    * outputs are non-cheap, and whole-stage codegen fuses the stack back
    * into one compiled pass.
    */
  def withFixedTitle(df: DataFrame, raw: Column,
      fixedOut: String = "fixed_title", normOut: String = "normalized"): DataFrame = {
    val stepped = fixTitleSteps.zipWithIndex.foldLeft(
      df.withColumn("__orig", raw).withColumn("__acc", col("__orig"))) {
      case (acc, (f, i)) =>
        acc.withColumn(s"__s$i", f(col("__acc")))
          .withColumn("__acc",
            when(trim(col(s"__s$i")) === "", col("__orig")).otherwise(col(s"__s$i")))
          .drop(s"__s$i")
    }
    stepped
      .withColumn(fixedOut, col("__acc"))
      .withColumn(normOut, lower(trim(regexp_replace(col("__acc"), " +", " "))))
      .drop("__orig", "__acc")
  }

  /** ISO-8601 time-duration → milliseconds (the Spark-native equivalent of
    * the reference's aniso8601 parse, dags/scripts/youtube_elt.py).
    * Handles PTnHnMnS with any component optional.
    *
    * r16: arithmetic parse — instr + substr instead of three
    * regexp_extract passes. Each regex ran a java.util.regex matcher per
    * row per unit (the operator's dominant cpuSec at every scale); the
    * positional form reads each component once with codegen'd string
    * intrinsics. Identical output on every well-formed PTnHnMnS string
    * (components in H,M,S order after the "PT" prefix, any subset
    * present; a missing unit contributes 0, null input parses to 0) —
    * hash-gated against the oracle's regexp form.
    */
  def iso8601Ms(c: Column): Column = {
    val hPos = instr(c, "H")
    val mPos = instr(c, "M")
    val sPos = instr(c, "S")
    val h = when(hPos > 0, c.substr(lit(3), hPos - 3).cast("long"))
      .otherwise(0L)
    val mStart = when(hPos > 0, hPos + 1).otherwise(lit(3))
    val m = when(mPos > 0, c.substr(mStart, mPos - mStart).cast("long"))
      .otherwise(0L)
    val sStart = when(mPos > 0, mPos + 1).otherwise(mStart)
    val sec = when(sPos > 0, c.substr(sStart, sPos - sStart).cast("long"))
      .otherwise(0L)
    (coalesce(h, lit(0L)) * 3600L + coalesce(m, lit(0L)) * 60L +
      coalesce(sec, lit(0L))) * 1000L
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reusable scalar column operations.
  *
  * Re-expressions of the reference's scalar surface (SURVEY.md §2.8,
  * X1-X9) plus the exact-decimal conventions the whole engine uses for
  * cross-engine deterministic arithmetic.
  *
  * Scale note: everything here is a plain Catalyst expression — codegen'd
  * inside whole-stage codegen, no UDF / serialization boundary (the
  * reference crosses into Python workers for the same math,
  * royalties.py:306).
  */
object ColumnLib {

  /** Exact 2-dp money decimal. Money must never be summed as double:
    * double fold order is nondeterministic under parallel aggregation.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Final presentation cast: exact decimal -> double (deterministic,
    * IEEE-754 nearest) once all aggregation is done.
    */
  def asDouble(c: Column): Column = c.cast("double")

  /** X1 — category-id normalization: insert `0` after any dot that
    * precedes a digit ("3.1" -> "3.01"). Mirrors reference
    * top10.py:79-81 (Python lookahead regex); Java regex supports the
    * same lookahead.
    */
  def normalizeDottedId(c: Column): Column =
    regexp_replace(c, "\\.(?=\\d)", ".0")

  /** X2 — `yyyy-MM-dd` day key from a timestamp (reference keeps
    * timestamps as ISO strings and substrings them, top10.py:184-185;
    * we derive from a real TimestampType).
    */
  def dayKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** X3 — `yyyy-MM` month key (royalties.py:203-204). */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** X4 — UTC-offset extraction from a fixed-layout
    * `yyyy-MM-ddTHH:mm:ss±hh:mm` ISO string: chars 20-25
    * (platform_usage.py:80-81). Documented fixed-width assumption: a
    * `Z`-suffixed or fractional-second timestamp yields garbage, as in
    * the reference.
    */
  def tzOffset(isoString: Column): Column = substring(isoString, 20, 6)

  /** X5-X7 — royalty amount: price * (1 - discount) * percent, zeroed
    * for promoted items (royalties.py:230-233 semantics: promotion
    * earns 0). All-decimal, exact; divide by 100 only after the final
    * aggregation, in double.
    */
  def royaltyBase(price: Column, discount: Column, percent: Column, isPromo: Column): Column =
    when(isPromo, lit(0).cast(DecimalType(31, 4)))
      .otherwise((dec2(price) * (lit(1).cast(DecimalType(4, 2)) - dec2(discount))
        * percent.cast(DecimalType(4, 0))).cast(DecimalType(31, 4)))

  /** X9 — percentage share, computed in double from two exact decimals
    * (platform_usage.py:105-107 does this via a Python UDF; this is a
    * plain codegen'd expression).
    */
  def sharePct(part: Column, total: Column): Column =
    asDouble(part) / asDouble(total) * 100
}

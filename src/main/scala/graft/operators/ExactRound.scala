package graft.operators

/** Exact cross-engine rounding for SMALL-INTEGER RATIONALS (r19).
  *
  * Found at sf0.1 (ORACLE_SF01_r19.json): columns of the form
  * `round(int/int, 4)` land on TRUE decimal half-way ties (…5 at the
  * 5th decimal) with positive probability, and there the engines
  * structurally disagree — Spark's Round goes through
  * `BigDecimal.valueOf` (shortest decimal repr of the double, ties
  * round UP), DuckDB multiplies in double space (the nearest double
  * sits a hair below the tie and rounds DOWN). Value columns drift by
  * 1e-4; worse, a rounded value used in a FILTER (the jaccard
  * thresholds) flips ROW MEMBERSHIP between engines.
  *
  * For a non-negative rational num/den the half-up round at the 4th
  * decimal is exactly
  *
  *   q4 = floor((10^4·num + den/2) / den) = (2·10^4·num + den) div (2·den)
  *
  * — pure BIGINT arithmetic both engines compute bit-identically
  * (`div` truncates toward zero ≡ floor for non-negatives; DuckDB's
  * `//` floors). The *Int forms return q4 itself (the value ×10⁴) so
  * threshold filters compare INTEGERS: `round4(j) ≥ 0.8` ⇔
  * `q4 ≥ 8000`, tie-free by construction.
  *
  * Scope: only ratios whose numerator and denominator are integers in
  * the plan. Irrational-valued rounds (cosines, logs, tf·idf) keep
  * plain round — their ties are measure-zero.
  */
private[operators] object ExactRound {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, pmod}

  /** Column form of [[spark4Int]]: the Column API has no integer
    * division, so q4 = (a − a mod b)/b with a = 2·10⁴·num + den,
    * b = 2·den — the subtraction makes a an exact multiple of b, and
    * IEEE double division of one representable exact multiple by its
    * representable divisor is exact (a ≤ 5e13 ≪ 2^53 for any
    * realistic count). Non-negative operands only.
    */
  def round4Int(num: Column, den: Column): Column = {
    val a = lit(20000L) * num.cast("long") + den.cast("long")
    val b = lit(2L) * den.cast("long")
    ((a - pmod(a, b)) / b).cast("long")
  }

  /** round-half-up(num/den, 4) as a DOUBLE Column — the value every
    * `round(int/int, 4)` output column now carries (k/10⁴ divides
    * exactly to the same double on both engines).
    */
  def round4(num: Column, den: Column): Column =
    round4Int(num, den) / lit(10000.0)

  /** Scale-6 twins, for the 6-decimal contract columns (mixture p). */
  def round6(num: Column, den: Column): Column = {
    val a = lit(2000000L) * num.cast("long") + den.cast("long")
    val b = lit(2L) * den.cast("long")
    ((a - pmod(a, b)) / b).cast("long") / lit(1000000.0)
  }

  def duck6(num: String, den: String): String =
    s"(((2000000 * (($num)::BIGINT) + (($den)::BIGINT)) // (2 * (($den)::BIGINT))) / 1000000::DOUBLE)"

  // NOT converted (documented residuals): rounds whose numerator is a
  // QUANTIZED-IRRATIONAL double (mixture upsample = round6-weight / p,
  // upsample rate, hybrid RRF sums) — the exact rational form needs the
  // weight's 10⁶ quantum times the corpus total in the numerator, which
  // leaves 64-bit range around ~5·10¹⁴ corpus units; and their tie
  // probability requires an irrational-derived quantum to land on a
  // rational's half-way boundary. Revisit with DECIMAL(38)/HUGEINT
  // arithmetic if a scale point ever exposes one.

  /** Spark SQL round-half-up(num/den, 4) as DOUBLE; num ≥ 0, den > 0. */
  def spark4(num: String, den: String): String =
    s"(${spark4Int(num, den)}) / cast(10000 as double)"

  /** Spark SQL: the rounded value ×10⁴ as BIGINT — for exact filters. */
  def spark4Int(num: String, den: String): String =
    s"((20000 * cast(($num) as bigint) + cast(($den) as bigint)) div (2 * cast(($den) as bigint)))"

  /** DuckDB twins of the above (`//` is integer floor division). */
  def duck4(num: String, den: String): String =
    s"(${duck4Int(num, den)}) / 10000::DOUBLE"

  def duck4Int(num: String, den: String): String =
    s"((20000 * (($num)::BIGINT) + (($den)::BIGINT)) // (2 * (($den)::BIGINT)))"
}

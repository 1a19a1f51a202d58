package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers (SURVEY.md §7.5 #4).
  *
  * `round()` implementations disagree at representation boundaries: Spark
  * rounds the exact binary value via BigDecimal HALF_UP, DuckDB rounds in
  * double math — e.g. round(86684.104949999..., 4) gives .1050 vs .1049.
  * Both engines instead computing the *identical* IEEE-754 sequence
  * `floor(x * 10^n + 0.5) / 10^n` yields bit-identical results on identical
  * inputs, and the `+ 0.5` absorbs ±ulp noise whenever the true value has
  * ≤ n decimals.
  *
  * For aggregates over decimal-valued data (prices, quantities), the
  * *input* doubles are not identical across engines (summation order
  * differs), so sums are computed in DECIMAL — exact, order-independent —
  * and only cast to double after rounding.
  */
object QueryUtils {

  /** Portable float rounding: identical op sequence on both engines. */
  def fr(c: Column, n: Int): Column = {
    val s = lit(math.pow(10, n))
    floor(c * s + lit(0.5)) / s
  }

  /** Exact, summation-order-independent sum for decimal-ish doubles. */
  def decSum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(s"decimal($precision,$scale)"))
}

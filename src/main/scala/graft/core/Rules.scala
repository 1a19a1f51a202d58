package graft.core

/** pandas offset-alias parsing ("1T", "5T", "1H", "30S", "1D" …) → step
  * duration. Mirrors the rule surface the reference accepts in
  * `config/default.yml` timeframes and `repair_gaps`/`resample_ohlc`
  * (reference: src/etl/transform/gaps.py:59-61, resample.py:72).
  */
object Rules {

  private val Pattern = "^(\\d+)?\\s*(T|MIN|H|S|D|W)$".r

  /** Step length in seconds for a pandas offset alias. */
  def stepSeconds(rule: String): Long = {
    val up = rule.trim.toUpperCase
    up match {
      case Pattern(n, unit) =>
        val k = Option(n).map(_.toLong).getOrElse(1L)
        val u = unit match {
          case "T" | "MIN" => 60L
          case "H"         => 3600L
          case "S"         => 1L
          case "D"         => 86400L
          case "W"         => 7L * 86400L
        }
        k * u
      case _ =>
        throw new IllegalArgumentException(s"Unsupported offset alias: $rule")
    }
  }

  def stepMicros(rule: String): Long = stepSeconds(rule) * 1000000L

  /** Spark interval expression string for the alias (for `sequence()`). */
  def intervalExpr(rule: String): String = s"INTERVAL ${stepSeconds(rule)} SECOND"

  /** Timeframe suffix used in output names: "1T" -> "1m", "1H" -> "1h"
    * (reference: src/run.py:224 lowercases and maps T->m).
    */
  def suffix(rule: String): String =
    rule.trim.toUpperCase.replace("MIN", "T").replace("T", "m").toLowerCase
}

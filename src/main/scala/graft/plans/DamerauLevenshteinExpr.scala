package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Full (unrestricted) Damerau–Levenshtein distance — the Lowrance–Wagner
  * algorithm, NOT the restricted OSA variant Spark users usually hand-roll:
  * `dl("CA","ABC") = 2` (OSA says 3), which is exactly what the DuckDB
  * oracle's `damerau_levenshtein` computes (verified on the distinguishing
  * pairs). Spark ships only plain `levenshtein`; transposition-aware
  * distance is the standard typo metric for record linkage, so it joins
  * `jaro_winkler` in the linkage scorer family.
  *
  * Operates on UTF-8 bytes (matching the oracle's byte semantics on
  * ASCII keys). The alphabet-indexed DP needs the FULL (la+2)×(lb+2)
  * matrix — O(|a|·|b|) ints — because transposition lookups reach
  * arbitrarily far back; production callers must length-guard pairs the
  * same way q102 prunes before `levenshtein` (blocking keys here are
  * ≤40 bytes, so a cell matrix tops out at ~1.7 k ints).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DamerauLevenshtein.distance(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance–Wagner unrestricted DL over raw bytes. */
  def distance(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2) with a sentinel border row/col of `inf`
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256) // last row index where each byte occurred
    i = 1
    while (i <= la) {
      var db = 0 // last column in this row with a match
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xFF)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost           // d[i-1][j-1] in offset coords
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (trans < m) m = trans
        d(i + 1)(j + 1) = m
        j += 1
      }
      da(a(i - 1) & 0xFF) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

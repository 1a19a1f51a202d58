package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity for record-linkage scoring.
  *
  * Reference parity (reference `etl-finance-pipeline` has no fuzzy
  * matcher; this is part of the training-data-pipeline extension
  * surface): the semantics mirror the rapidfuzz-style algorithm DuckDB
  * ships (`jaro_winkler_similarity`), which is the cross-engine oracle:
  *  - operates on UTF-8 BYTES, not codepoints (identical for ASCII
  *    keys, and exactly what the oracle engine compares);
  *  - match window = max(max(len)/2 − 1, 0) (integer floor, clamped —
  *    pairs of ≤3-byte strings only match at exact positions);
  *  - transposition count = flagged-position mismatches, INTEGER-halved
  *    (`t /= 2`) before entering the similarity;
  *  - jaro = (m/len1 + m/len2 + (m−t)/m) / 3, summed in exactly that
  *    order so the IEEE sequence is reproducible;
  *  - Winkler boost only when jaro > 0.7: sim += prefix·0.1·(1−sim)
  *    with common prefix capped at 4.
  *  - both empty → 1.0; one empty → 0.0; no matches → 0.0.
  *
  * Why an expression and not a UDF: the scorer sits inside candidate-pair
  * loops (blocking output), so it must stay inside whole-stage codegen —
  * `doGenCode` emits a static call, no boxing, no Row allocation.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.similarity(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Jaro–Winkler over raw bytes; see class doc for the exact contract. */
  def similarity(p: Array[Byte], t: Array[Byte]): Double = {
    val lp = p.length
    val lt = t.length
    if (lp == 0 && lt == 0) return 1.0
    if (lp == 0 || lt == 0) return 0.0

    // clamped at 0: for max-length ≤ 3 only exact positions match (the
    // oracle library's behavior, verified on 1-3 byte pairs)
    val bound = math.max(math.max(lp, lt) / 2 - 1, 0)
    val pFlags = new Array[Boolean](lp)
    val tFlags = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < lt) {
      val lo = math.max(0, i - bound)
      val hi = math.min(lp - 1, i + bound)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!pFlags(j) && p(j) == t(i)) {
          pFlags(j) = true
          tFlags(i) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // flagged-position mismatches, then the library's integer halving
    var trans = 0
    var pi = 0
    i = 0
    while (i < lt) {
      if (tFlags(i)) {
        while (!pFlags(pi)) pi += 1
        if (p(pi) != t(i)) trans += 1
        pi += 1
      }
      i += 1
    }
    val tHalf = trans / 2

    var sim = 0.0
    sim += m.toDouble / lp.toDouble
    sim += m.toDouble / lt.toDouble
    sim += (m.toDouble - tHalf.toDouble) / m.toDouble
    sim /= 3.0

    var prefix = 0
    val maxPrefix = math.min(math.min(lp, lt), 4)
    while (prefix < maxPrefix && p(prefix) == t(prefix)) prefix += 1
    if (sim > 0.7) sim += prefix.toDouble * 0.1 * (1.0 - sim)
    sim
  }
}

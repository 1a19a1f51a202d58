package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression computing the Shannon entropy (nats) of a string's
  * codepoint distribution in one pass: H = ln(n) − (Σ c·ln c)/n over the
  * per-codepoint counts c, n = total codepoints. Low entropy flags
  * repetitive/degenerate text (`aaaa…`, template spam), high entropy flags
  * random-noise text — a standard cheap quality signal next to the q37
  * ratio features.
  *
  * The composable form — explode to one row per character, groupBy count,
  * re-aggregate — shuffles O(corpus characters) rows to compute what is a
  * per-document local statistic. This is a fused projection instead: an
  * int[128] table for ASCII plus a spill map for the rest, nothing leaves
  * the row. Summation order is fixed (ascending codepoint), so the result
  * is bit-deterministic across partitionings; the entropy identity keeps
  * every ln() argument an exact small integer, which is what lets DuckDB
  * replay the value from a relational census.
  *
  * Empty and null-only inputs: "" → 0.0 (no distribution), null → null.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.CharEntropy.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  /** Codepoint-distribution entropy in nats, single UTF-8 byte scan. */
  def entropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val ascii = new Array[Long](128)
    // rare path (non-ASCII codepoints); TreeMap fixes summation order
    var spill: java.util.TreeMap[Integer, Long] = null
    var i = 0
    var n = 0L
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var w = 1
      if (b0 < 0x80) cp = b0
      else if (b0 < 0xE0) {
        w = 2; cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
      } else if (b0 < 0xF0) {
        w = 3; cp = ((b0 & 0x0F) << 12) |
          ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
      } else {
        w = 4; cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
      }
      if (cp < 128) ascii(cp) += 1
      else {
        if (spill == null) spill = new java.util.TreeMap[Integer, Long]()
        spill.put(cp, spill.getOrDefault(cp, 0L) + 1L)
      }
      n += 1
      i += w
    }
    if (n == 0L) return 0.0
    var acc = 0.0
    var c = 0
    while (c < 128) { // ascending codepoint: deterministic fp order
      if (ascii(c) > 0) acc += ascii(c) * Math.log(ascii(c).toDouble)
      c += 1
    }
    if (spill != null) {
      val it = spill.values().iterator()
      while (it.hasNext) { val v = it.next(); acc += v * Math.log(v.toDouble) }
    }
    Math.log(n.toDouble) - acc / n
  }
}

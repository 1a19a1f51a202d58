package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression counting CJK-unified-ideograph codepoints
  * (U+4E00–U+9FFF) in one pass over a string's UTF-8 bytes.
  *
  * The composable form — `length(regexp_replace(text, "[^一-鿿]",
  * ""))` — routes every document through the regex engine AND allocates
  * the stripped copy just to take its length. This is a branchy byte scan
  * instead: the target range is exactly the 3-byte UTF-8 sequences with
  * lead byte 0xE4–0xE9, so the scan decodes only those, allocates
  * nothing, and skips other sequences by their lead-byte width. Count is
  * identical to the regex form (both count codepoints in the range).
  */
case class CjkCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cjk_count"

  override def nullSafeEval(input: Any): Any =
    CjkCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.CjkCount.count($c);")

  override protected def withNewChildInternal(newChild: Expression): CjkCount =
    copy(child = newChild)
}

object CjkCount {

  /** Codepoints in [U+4E00, U+9FFF] of `s`, by raw UTF-8 byte scan. */
  def count(s: UTF8String): Long = {
    val bytes = s.getBytes
    var i = 0
    var n = 0L
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) i += 1                       // ASCII
      else if (b0 < 0xE0) i += 2                  // 2-byte seq (U+0080..07FF)
      else if (b0 < 0xF0) {                       // 3-byte seq (U+0800..FFFF)
        if (b0 >= 0xE4 && b0 <= 0xE9 && i + 2 < bytes.length) {
          val cp = ((b0 & 0x0F) << 12) |
            ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
          if (cp >= 0x4E00 && cp <= 0x9FFF) n += 1
        }
        i += 3
      } else i += 4                               // 4-byte seq (supplementary)
    }
    n
  }
}

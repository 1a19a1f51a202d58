package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression producing per-language stopword occurrence counts in
  * one fused pass over a document's word-hash array.
  *
  * The composable form — five `size(filter(toks, isInCollection(words)))`
  * probes, one per language — runs each filter as an INTERPRETED
  * higher-order lambda (no codegen, no CSE): 5 languages × 12 words ×
  * tokens string comparisons per document. Measured on q40 at sf0.1 that
  * made language ID ~3-5× the cost of its sibling text projections. This
  * expression takes the xxhash64 word hashes (the same narrow transform
  * the MinHash/shingle stages already feed) and does ONE sorted-array
  * binary search per token against the static 60-entry stopword hash
  * table; a bitmask per entry credits every language sharing the word
  * ("de"/"la" appear in multiple lists), so counts are identical to the
  * five string filters modulo 64-bit hash collisions (p ≈ 2^-64 per
  * distinct corpus token — the q31 content-hash caveat).
  *
  * Output: array<long> of per-language occurrence counts in
  * [[StopwordLangCounts.languages]] order.
  */
case class StopwordLangCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "stopword_lang_counts"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(StopwordLangCounts.counts(
      input.asInstanceOf[ArrayData].toLongArray()))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.StopwordLangCounts.counts($c.toLongArray()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordLangCounts =
    copy(child = newChild)
}

object StopwordLangCounts {

  /** Per-language stopword lists (the language-ID heuristic's vocabulary;
    * single source of truth — the operators side references this). Small
    * on purpose: 12 words per language keeps the table one cache line
    * deep and the lists broadcastable as literals where string form is
    * still wanted.
    */
  val languages: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu", "den", "von"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no", "los", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que", "dans", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人", "一", "这"))

  // sorted hash table + language bitmask per entry, built once at class
  // load with Spark's own xxhash64 (seed 42 — functions.xxhash64's
  // default), so `transform(toks, xxhash64)` feeds it directly
  private val (keys, masks): (Array[Long], Array[Int]) = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
    for (((_, words), i) <- languages.zipWithIndex; w <- words) {
      val h = XxHash64Function.hash(UTF8String.fromString(w), StringType, 42L)
      m(h) = m.getOrElse(h, 0) | (1 << i)
    }
    val ks = m.keys.toArray.sorted
    (ks, ks.map(m))
  }

  /** Per-language occurrence counts for one document's word hashes. */
  def counts(wh: Array[Long]): Array[Long] = {
    val out = new Array[Long](languages.length)
    var i = 0
    while (i < wh.length) {
      val idx = java.util.Arrays.binarySearch(keys, wh(i))
      if (idx >= 0) {
        var mask = masks(idx)
        var l = 0
        while (mask != 0) {
          if ((mask & 1) == 1) out(l) += 1
          mask >>>= 1
          l += 1
        }
      }
      i += 1
    }
    out
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native expression producing a document's DISTINCT 64-bit word n-gram
  * shingle hashes in one fused loop over its word-hash array.
  *
  * The composable form (`transform(shingles(text, n), s => xxhash64(s))`)
  * is quadratic per document: `slice(toks, i, n)` inside the lambda
  * re-evaluates the full `split(trim(lower(text)))` per shingle index —
  * higher-order functions run interpreted, with no codegen subexpression
  * elimination — and then builds a transient n-gram STRING per window
  * just to hash it. Measured on q61 at sf0.1 this was 7.2 s for a 260k-
  * shingle corpus. This expression takes the word hashes (one narrow
  * lambda pass, same shape the MinHash signature stage uses) and combines
  * each length-n window with an FNV-1a-style 64-bit fold — O(tokens × n)
  * long multiplies, zero string allocation — then sorts + dedupes in
  * place for per-document distinctness.
  *
  * Shorter-than-n documents fold ALL words into one hash, mirroring
  * `Dedup.shingles`' whole-text shingle for short docs, so document-
  * frequency semantics downstream are identical to the string form
  * (equal n-grams ⇒ equal hashes; unequal collide with p ≈ 2^-64 — the
  * q31 content-hash caveat at n-gram granularity).
  */
case class ShingleHashes(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.distinct(
      input.asInstanceOf[ArrayData].toLongArray(), shingleSize))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.ShingleHashes.distinct($c.toLongArray(), $shingleSize));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Positional sibling of [[ShingleHashes]]: every length-n window's hash in
  * START-POSITION ORDER, duplicates kept — the form span-level dedup needs
  * (`posexplode` recovers the start offset of each gram, so a corpus-
  * duplicated gram can be mapped back to the token range it covers).
  *
  * Short-document convention differs deliberately: a document with fewer
  * than n tokens yields an EMPTY array (no length-n span exists to be
  * duplicated — whole-short-doc duplication is exact dedup's job), where
  * the distinct form folds the whole array for document-frequency parity.
  */
case class ShingleHashesPos(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes_pos"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.positional(
      input.asInstanceOf[ArrayData].toLongArray(), shingleSize))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.ShingleHashes.positional($c.toLongArray(), $shingleSize));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 0xcbf29ce484222325L // FNV-1a offset basis
  private val Prime = 0x100000001b3L     // FNV-1a 64-bit prime

  /** Distinct FNV-folded hashes of every length-n window of `wh` (or of
    * the whole array when shorter than n), sorted ascending.
    */
  def distinct(wh: Array[Long], n: Int): Array[Long] = {
    val count = if (wh.length < n) 1 else wh.length - n + 1
    val out = new Array[Long](count)
    if (wh.length < n) {
      var h = Seed
      var j = 0
      while (j < wh.length) { h = (h ^ wh(j)) * Prime; j += 1 }
      out(0) = h
    } else {
      var i = 0
      while (i < count) {
        var h = Seed
        var j = i
        while (j < i + n) { h = (h ^ wh(j)) * Prime; j += 1 }
        out(i) = h
        i += 1
      }
    }
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** FNV-folded hash of every length-n window of `wh`, in start-position
    * order, duplicates kept; empty when fewer than n words exist.
    */
  def positional(wh: Array[Long], n: Int): Array[Long] = {
    if (wh.length < n) return Array.emptyLongArray
    val count = wh.length - n + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = Seed
      var j = i
      while (j < i + n) { h = (h ^ wh(j)) * Prime; j += 1 }
      out(i) = h
      i += 1
    }
    out
  }
}

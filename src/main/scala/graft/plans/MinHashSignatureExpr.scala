package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a full MinHash signature in ONE
  * fused loop over a document's word-hash array.
  *
  * Replaces the composable form in `Dedup.minHashSignatures` (explode one
  * row per shingle → groupBy(doc) with `numHashes` min-aggregates): that
  * shape materializes ~tokens×docs intermediate rows and pays a shuffle for
  * the per-document mins. This expression is narrow — one row in, one
  * signature out — with O(shingles × numHashes) multiply-adds and zero
  * intermediate allocation. Arithmetic is IDENTICAL to the aggregate form
  * (same seed-fixed universal-hash family, same rolling polynomial mod
  * P = 2^31−1 applied per step, same whole-array fold for short docs), so
  * signatures — and every LSH band/candidate downstream — are bit-equal.
  *
  * Overflow safety mirrors the SQL form's ANSI bound: acc·31 + h < 2^36 and
  * h·a < 2^62, both inside long range.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val wh = input.asInstanceOf[ArrayData]
    val out = MinHashSignature.signature(
      wh.toLongArray(), shingleSize,
      MinHashSignature.params(numHashes))
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ps = ctx.addReferenceObj("graftMinhashParams",
        MinHashSignature.params(numHashes), "long[]")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.plans.MinHashSignature.signature(
         |  $c.toLongArray(), $shingleSize, $ps);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val P: Long = 2147483647L // 2^31 - 1, Mersenne prime

  /** Seed-fixed universal-hash family, flattened [a0,b0,a1,b1,…] — the
    * same family `Dedup.hashParams` draws (Random(42)); cached per size.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def params(numHashes: Int): Array[Long] =
    cache.computeIfAbsent(numHashes, n => {
      val rnd = new scala.util.Random(42)
      val out = new Array[Long](n * 2)
      var i = 0
      while (i < n) {
        // draw order and bounds replicate Dedup.hashParams exactly —
        // (1 + nextInt(MaxValue-1), nextInt(MaxValue)) per pair — so the
        // RNG stream, and therefore every signature, is bit-identical
        out(2 * i) = 1L + rnd.nextInt(Int.MaxValue - 1).toLong
        out(2 * i + 1) = rnd.nextInt(Int.MaxValue).toLong
        i += 1
      }
      out
    })

  /** One fused pass: rolling-polynomial shingle hashes feeding all
    * signature mins. Static forwarder — called from generated code.
    */
  def signature(wh: Array[Long], shingleSize: Int, ps: Array[Long]): Array[Long] = {
    val k = ps.length / 2
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = wh.length
    def absorb(h: Long): Unit = {
      var j = 0
      while (j < k) {
        val v = (h * ps(2 * j) + ps(2 * j + 1)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    if (n < shingleSize) {
      // short doc: one shingle folding the whole token list
      var acc = 7L
      var i = 0
      while (i < n) { acc = (acc * 31L + wh(i)) % P; i += 1 }
      absorb(acc)
    } else {
      var i = 0
      while (i <= n - shingleSize) {
        var acc = 7L
        var t = 0
        while (t < shingleSize) { acc = (acc * 31L + wh(i + t)) % P; t += 1 }
        absorb(acc)
        i += 1
      }
    }
    mins
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(DoubleType)` columns, built purely from
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`) so
  * every operation stays inside whole-stage codegen — no UDFs, no serialization
  * boundary, and the same column expressions work unchanged in Structured
  * Streaming.
  *
  * Design note (scale): a brute-force cosine join is O(N*M) — fine for a
  * broadcast-able query side; the 100 TB path is LSH bucketing
  * (see [[graft.operators.Similarity]]), which reuses these same expressions
  * inside each bucket.
  */
object VectorFunctions {

  /** Elementwise dot product; sequential left-to-right fold, which makes the
    * summation order deterministic (bit-reproducible vs a single-threaded
    * oracle).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. Inputs are cast to
    * `array<double>` so float32 embeddings widen exactly.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, p) => acc + p))

  /** Normalize a vector to unit L2 length (null-safe: zero vector -> nulls). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x / n)
  }
}

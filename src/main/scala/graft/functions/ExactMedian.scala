package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact median by histogram bucketing — the scale path for exact
  * percentiles.
  *
  * Spark's `median()` (exact `percentile`) accumulates a value→count map
  * per partition and merges EVERY distinct value through one reducer:
  * measured 1.6 s on a 600 k-row cached frame, and unbounded driver-side
  * state on a 100 TB column. This replacement finds the same exact value
  * with fixed-size jobs:
  *
  *  1. the caller's existing profile aggregate supplies count / min /
  *     finite-max / NaN-count (no extra pass over the frame);
  *  2. ONE histogram aggregation (8192 fixed-width buckets — a few KB to
  *     the driver) locates the bucket(s) holding the two middle ranks;
  *  3. ONE filtered collect fetches just those buckets' values (~n/8192
  *     rows) and picks the ranks driver-side. A pathologically dense
  *     bucket recurses with the bucket bounds as the new range — each
  *     level narrows the range 8192×, so depth is bounded by double
  *     precision (~4 levels worst case) and every job stays fixed-size.
  *
  * Semantics match Spark `median` / pandas / DuckDB exactly: nulls are
  * ignored, NaN sorts greater than every number (a NaN middle rank makes
  * the median NaN), and an even count averages the two middle values.
  * Infinite endpoints (no finite price data has them) fall back to the
  * built-in aggregate rather than bucketing an infinite range.
  */
object ExactMedian {

  val Buckets = 8192

  /** Values collected per selection before recursing into the bucket. */
  val CollectCap = 1 << 20

  /** Stats columns to splice into the caller's single profile aggregate:
    * (count incl. NaN, min, max of finite values, NaN count). Call as
    * `stats(col("CLOSE")).map(_.as(...))` — see Reporting for naming.
    */
  def stats(c: Column): Seq[Column] = Seq(
    count(c),
    min(c),
    max(when(isnan(c), lit(null)).otherwise(c)),
    sum(when(isnan(c), 1).otherwise(0)))

  /** Exact median of numeric column `c` given the stats from the caller's
    * profile aggregate. `n` counts non-null values (NaN included), `lo` is
    * the column min, `hiFinite` the max over non-NaN values.
    */
  def median(df: DataFrame, c: String, n: Long, lo: Double,
             hiFinite: Double, nNaN: Long): Option[Double] = {
    if (n <= 0) return None
    // the two middle 1-based ranks (equal when n is odd); Spark's
    // percentile(0.5) interpolates halfway between them, i.e. averages
    val r1 = (n + 1) / 2
    val r2 = n / 2 + 1
    if (r1 > n - nNaN) return Some(Double.NaN) // NaN region covers both
    if (lo.isInfinite || hiFinite.isInfinite)
      return Some(df.agg(expr(s"median(`$c`)")).collect()(0).getDouble(0))
    val v1 = selectRanks(df, c, lo, hiFinite, Seq(r1, r2.min(n - nNaN)), 0)
    val x1 = v1(r1)
    val x2 = if (r2 > n - nNaN) Double.NaN else v1(r2.min(n - nNaN))
    Some((x1 + x2) / 2)
  }

  /** The values at the given 1-based ranks of the non-NaN, non-null subset
    * of `c` within [lo, hi]. Ranks must be within the finite value count.
    * One histogram job + one bucket collect; recurses per-rank only when a
    * bucket exceeds CollectCap.
    */
  private def selectRanks(df: DataFrame, c: String, lo: Double, hi: Double,
                          ranks: Seq[Long], depth: Int): Map[Long, Double] = {
    if (lo == hi || depth > 12) return ranks.map(_ -> lo).toMap
    val w = (hi - lo) / Buckets
    if (w == 0 || w.isInfinite) return ranks.map(_ -> lo).toMap
    val vals = col(c).cast("double")
    val finite = df.filter(vals.isNotNull && !isnan(vals) &&
      vals >= lo && vals <= hi)
    val bucket = least(floor((vals - lit(lo)) / lit(w)), lit(Buckets - 1L))
      .cast("long")
    val hist = finite.groupBy(bucket.as("_b")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

    // map each rank to its bucket + the rank's offset within that bucket
    var cum = 0L
    var need = ranks.distinct.sorted
    var located = Vector.empty[(Long, Long, Long)] // (rank, bucket, local)
    for ((b, cnt) <- hist if need.nonEmpty) {
      while (need.nonEmpty && need.head <= cum + cnt) {
        located :+= ((need.head, b, need.head - cum))
        need = need.tail
      }
      cum += cnt
    }
    require(need.isEmpty, s"rank beyond histogram mass: $need (cum=$cum)")

    val byBucket = located.groupBy(_._2)
    val histMap = hist.toMap
    byBucket.toSeq.flatMap { case (b, rs) =>
      val bLo = lo + b * w
      val bHi = if (b == Buckets - 1) hi else lo + (b + 1) * w
      if (histMap(b) <= CollectCap) {
        val arr = finite
          .filter(vals >= bLo && (if (b == Buckets - 1) vals <= hi
                                  else vals < bHi))
          .select(vals).collect().map(_.getDouble(0)).sorted
        rs.map { case (rank, _, local) => rank -> arr((local - 1).toInt) }
      } else {
        val inner = selectRanks(df, c, bLo, bHi,
          rs.map(_._3), depth + 1)
        rs.map { case (rank, _, local) => rank -> inner(local) }
      }
    }.toMap
  }
}

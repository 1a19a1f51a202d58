package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExactMedian
import graft.operators.Reporting

/** ExactMedian must return bit-identical values to Spark's built-in
  * `median()` aggregate — it exists only to bound the merge state at
  * scale, never to change the answer.
  */
class ExactMedianSpec extends SparkSpec {
  import spark.implicits._

  /** Built-in median for the comparison oracle. */
  private def builtinMedian(df: DataFrame): Option[Double] = {
    val r = df.agg(median(col("CLOSE"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** Runs ExactMedian the way Reporting wires it: stats from one agg,
    * then histogram selection.
    */
  private def exactMedian(df: DataFrame): Option[Double] = {
    val cd = col("CLOSE").cast("double")
    val r = df.agg(
      count(col("CLOSE")).as("n"),
      min(cd).as("lo"),
      max(when(isnan(cd), lit(null)).otherwise(cd)).as("hiF"),
      sum(when(isnan(cd), 1L).otherwise(0L)).as("nNaN")).collect()(0)
    val n = r.getAs[Long]("n")
    if (n == 0) None
    else ExactMedian.median(df, "CLOSE", n,
      lo = r.getAs[Double]("lo"),
      hiFinite = if (r.isNullAt(r.fieldIndex("hiF"))) Double.NaN
                 else r.getAs[Double]("hiF"),
      nNaN = if (r.isNullAt(r.fieldIndex("nNaN"))) 0L
             else r.getAs[Long]("nNaN"))
  }

  private def check(values: Seq[java.lang.Double], clue: String): Unit = {
    val df = values.toDF("CLOSE").repartition(4)
    val (e, b) = (exactMedian(df), builtinMedian(df))
    (e, b) match {
      case (None, None) => // both empty — fine
      case (Some(x), Some(y)) =>
        if (x.isNaN) assert(y.isNaN, s"$clue: exact=NaN builtin=$y")
        else assert(x == y, s"$clue: exact=$x builtin=$y")
      case _ =>
        // builtin median() ignores NaN only via nulls; an all-NaN column
        // yields NaN from both sides — reaching here is a real mismatch
        fail(s"$clue: exact=$e builtin=$b")
    }
  }

  test("odd and even counts, plain values") {
    check(Seq[java.lang.Double](3.0, 1.0, 2.0), "odd")
    check(Seq[java.lang.Double](4.0, 1.0, 3.0, 2.0), "even averages middles")
    check(Seq[java.lang.Double](5.0), "single value")
    check(Seq[java.lang.Double](7.5, 7.5, 7.5, 7.5), "all equal")
  }

  test("nulls are ignored") {
    check(Seq[java.lang.Double](null, 2.0, null, 8.0, 4.0), "nulls odd")
    check(Seq[java.lang.Double](1.0, null, 9.0), "nulls even")
  }

  test("dense duplicate buckets and negative ranges") {
    check(Seq.fill(5000)(java.lang.Double.valueOf(42.0)) ++
      Seq[java.lang.Double](41.0, 43.0), "one dense bucket")
    check((1 to 1001).map(i => java.lang.Double.valueOf(-500.0 + i * 0.25)),
      "negative range")
  }

  test("randomized frames match builtin median exactly") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(4000)
      val vals: Seq[java.lang.Double] = (1 to n).map { _ =>
        rnd.nextInt(20) match {
          case 0 => null
          case 1 => java.lang.Double.valueOf(rnd.nextInt(10).toDouble) // dups
          case _ => java.lang.Double.valueOf(rnd.nextGaussian() * 1e4)
        }
      }
      check(vals, s"trial $trial n=$n")
    }
  }

  test("NaN sorts greater than every number (pandas/DuckDB order)") {
    // NaN beyond the middle ranks — median stays finite
    check(Seq[java.lang.Double](1.0, 2.0, 3.0, Double.NaN, Double.NaN),
      "NaN tail, finite median")
    // NaN reaches a middle rank — median is NaN
    val e = exactMedian(Seq[java.lang.Double](1.0, Double.NaN, Double.NaN)
      .toDF("CLOSE"))
    assert(e.exists(_.isNaN), s"NaN middle rank: $e")
    val all = exactMedian(Seq[java.lang.Double](Double.NaN, Double.NaN)
      .toDF("CLOSE"))
    assert(all.exists(_.isNaN), s"all NaN: $all")
  }

  test("dataQualityReport exact-median path matches builtin path") {
    // 500 non-null CLOSE values under a 200k+ claimed row count: the
    // provisional histogram choice must downgrade to the small median()
    // job post-agg (the gate runs on _cn, not the caller-claimed total)
    val df = (1 to 500).map(i =>
      ("AAA", java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        100.0 + (i % 37) * 0.5)).toDF("SYMBOL", Reporting.TsCol, "CLOSE")
    val small = Reporting.dataQualityReport(df, computeIndicators = false)
    val big = Reporting.dataQualityReport(df, computeIndicators = false,
      knownRows = Some(Reporting.ExactMedianRowThreshold + 1))
    assert(big("close_median") == small("close_median"),
      s"report medians differ: ${big("close_median")} vs ${small("close_median")}")
  }

  test("dataQualityReport histogram path matches builtin above the _cn gate") {
    import org.apache.spark.sql.functions._
    val n = Reporting.ExactMedianRowThreshold + 100
    val df = spark.range(n).select(
      lit("AAA").as("SYMBOL"),
      timestamp_seconds(lit(1704067200L) + col("id")).as(Reporting.TsCol),
      (col("id") % 997).cast("double").as("CLOSE"))
    val rep = Reporting.dataQualityReport(df, computeIndicators = false,
      knownRows = Some(n))
    val expected = df.agg(median(col("CLOSE"))).collect()(0).getDouble(0)
    assert(rep("close_median") == expected,
      s"histogram median ${rep("close_median")} != builtin $expected")
  }
}

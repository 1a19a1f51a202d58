package graft

import java.time.{Instant, ZoneId}

import graft.functions.TzLocalize

/** DST policy matrix (tests/test_timezone_normalize.py:10-49):
  * ambiguous → NaT, nonexistent → shift_forward, normal → unique instant.
  */
class TzLocalizeSpec extends SparkSpec {

  private val ny = ZoneId.of("America/New_York")

  private def wall(s: String): Instant = Instant.parse(s + "Z")

  test("normal wall time localizes to the unique instant") {
    val r = TzLocalize.localizeInstant(wall("2023-06-01T12:00:00"), ny)
    assert(r.contains(Instant.parse("2023-06-01T16:00:00Z"))) // EDT = UTC-4
  }

  test("ambiguous fall-back wall time becomes null (NaT)") {
    // 2023-11-05 01:30 America/New_York occurs twice
    val r = TzLocalize.localizeInstant(wall("2023-11-05T01:30:00"), ny)
    assert(r.isEmpty)
  }

  test("nonexistent spring-forward wall time shifts to gap end") {
    // 2023-03-12 02:30 America/New_York does not exist; pandas
    // nonexistent="shift_forward" -> 03:00 EDT = 07:00 UTC
    val r = TzLocalize.localizeInstant(wall("2023-03-12T02:30:00"), ny)
    assert(r.contains(Instant.parse("2023-03-12T07:00:00Z")))
  }

  test("UTC localization is the identity") {
    val i = wall("2024-01-01T00:00:00")
    assert(TzLocalize.localizeInstant(i, ZoneId.of("UTC")).contains(i))
  }

  test("codegen expression matches the UDF across the DST matrix") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    // one column of wall stamps straddling both transitions + normal times
    val walls = Seq(
      "2023-06-01 12:00:00", // normal EDT
      "2023-01-15 12:00:00", // normal EST
      "2023-11-05 01:30:00", // ambiguous -> null
      "2023-03-12 02:30:00", // nonexistent -> gap end
      "2023-03-12 03:00:00", // first instant after the gap
      "2023-12-31 23:59:59")
    val df = walls.toDF("w")
      .select(col("w").cast("timestamp").as("wall"))
    val both = df.select(
      call_function("tz_localize", col("wall"), lit("America/New_York"))
        .as("expr_form"),
      TzLocalize.localize(col("wall"), "America/New_York").as("udf_form"))
    val rows = both.collect()
    for (r <- rows)
      assert(r.get(0) == r.get(1), s"expr vs udf mismatch: $r")
    // and null really is the ambiguous stamp, not a crash
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  test("the normalize plan carries no scala UDF for region-zone ingest") {
    import scala.collection.immutable.ListMap
    import spark.implicits._
    // parquet-backed input: a LocalRelation would let the optimizer
    // constant-fold the whole localization out of the plan
    val p = java.nio.file.Files.createTempDirectory("graft_tzplan")
      .resolve("in.parquet").toString
    Seq(("2024-01-01 00:00:00", "1.0"), ("2024-01-01 00:01:00", "1.1"))
      .toDF("timestamp", "close").write.parquet(p)
    val df = spark.read.parquet(p)
    val res = graft.operators.Normalize(df,
      ListMap("TIMESTAMP" -> Seq("timestamp"), "CLOSE" -> Seq("close")),
      requiredColumns = Seq("TIMESTAMP", "CLOSE"),
      sourceTz = Some("America/New_York"), computeReport = false)
    val plan = res.unsorted.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"normalize must stay UDF-free:\n$plan")
    assert(plan.contains("tz_localize"), s"expression form expected:\n$plan")
  }
}

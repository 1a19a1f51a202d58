package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Schema-drift guard for the driver-generated `events` table.
  *
  * Round 8 regression: the driver regenerated testdata and `events.ts`
  * changed shape from nanos-as-long to microsecond TIMESTAMP_NTZ, breaking
  * every query doing `unix_seconds`/`unix_micros`/`cast("double")` on `ts`
  * (q11, q47, q97, q101, q103). This suite materializes BOTH physical
  * shapes from the current testdata and asserts `Tables.events` normalizes
  * each to `ts: TimestampType` with identical values, then runs the five
  * previously-broken queries end-to-end on each shape. If the driver ships
  * a third shape, this fails in `sbt test` before the correctness gate.
  */
class EventsSchemaDriftSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private val tsSensitive = Seq("q11_range_self_join", "q47_sessionize",
    "q97_stat_moments", "q101_twap", "q103_regr_family")

  /** Build a fixture sfDir: all tables copied from sf0.001, events rewritten
    * with `ts` in the given physical shape. */
  private def fixtureDir(tag: String)(writeEvents: String => Unit): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$tag").toString
    for (t <- Tables.All if t != "events")
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    writeEvents(s"$dir/events.parquet")
    dir
  }

  private lazy val canonical = Tables.events(spark, src)

  private lazy val ntzDir = fixtureDir("ntz") { out =>
    canonical.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .coalesce(1).write.mode("overwrite").parquet(out)
  }

  private lazy val nsLongDir = fixtureDir("nslong") { out =>
    canonical.withColumn("ts", (unix_micros(col("ts")) * 1000L))
      .coalesce(1).write.mode("overwrite").parquet(out)
  }

  for ((tag, dir) <- Seq("TIMESTAMP_NTZ" -> (() => ntzDir),
                         "nanos-as-long" -> (() => nsLongDir))) {
    test(s"Tables.events normalizes $tag ts to TimestampType, values intact") {
      val ev = Tables.events(spark, dir())
      assert(ev.schema("ts").dataType == TimestampType,
        s"$tag must normalize to TimestampType, got ${ev.schema("ts").dataType}")
      val want = canonical.select(col("event_id"), col("ts"))
      val got = ev.select(col("event_id"), col("ts"))
      assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty,
        s"$tag round-trip must preserve every (event_id, ts) pair")
    }

    test(s"ts-sensitive queries run end-to-end on $tag events") {
      for (q <- tsSensitive) {
        val base = SparkEntry.queries(q)(spark, src).count()
        val drifted = SparkEntry.queries(q)(spark, dir()).count()
        assert(drifted == base, s"$q on $tag: $drifted rows, expected $base")
      }
    }
  }

  test("embeddings drift: float32 or float64 elements both analyze clean") {
    // the driver has shipped FLOAT[] embeddings so far; a regeneration to
    // DOUBLE[] must not break the vector queries (they all cast to
    // array<double> internally — this pins that)
    val dir = fixtureDir("embdouble") { out =>
      Files.copy(Paths.get(s"$src/events.parquet"), Paths.get(out),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // overwrite the copied float32 file with a float64 directory
    Tables.embeddings(spark, src)
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    for (q <- Seq("q34_cosine_pairs", "q39_ann_topk", "q112_pq_encode")) {
      val base = SparkEntry.queries(q)(spark, src).count()
      val drifted = SparkEntry.queries(q)(spark, dir).count()
      assert(drifted == base, s"$q on double embeddings: $drifted vs $base")
    }
  }

  test("every registered query survives analysis on the NTZ-events fixture") {
    // Analysis (not execution): catches DATATYPE_MISMATCH on ts without the
    // cost of running all 104 queries. Queries that execute eagerly inside
    // their builder still run, but only the handful with driver-side
    // codebook steps do, and sf0.001 keeps that cheap.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, ntzDir).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty,
      s"queries failing analysis on NTZ events:\n${failures.mkString("\n")}")
  }
}

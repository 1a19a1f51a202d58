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
}

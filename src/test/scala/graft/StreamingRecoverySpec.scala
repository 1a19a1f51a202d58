package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Checkpoint recovery: streaming state must survive a stop/restart.
  *
  * Every streaming mirror is gate-checked for single-run batch
  * equivalence (q331–q341), but a production stream RESTARTS — from the
  * WAL checkpoint, onto the exactly-once file sink. These tests stop a
  * query mid-stream (state open, nothing emitted), append more input,
  * restart from the same checkpoint, and assert the FINAL output could
  * only have been produced if the pre-restart state was restored:
  *  - sessionize: a session spanning the restart must come back as ONE
  *    row counting both phases' events (engine-managed session_window
  *    merge state);
  *  - as-of attach: an event arriving after the restart must match a
  *    quote buffered BEFORE it (custom `AsofState` through the state
  *    store encoder);
  *  - gap repair: a gap whose edges straddle the restart must fill with
  *    the pre-restart edge's value (custom `RepairState`: pending buffer
  *    + ffill carry);
  *  - near-dup: a duplicate arriving after the restart must be
  *    attributed to the PRE-restart bucket owner (custom `BucketOwner`
  *    state — lost state silently re-registers the dup as a fresh owner
  *    and emits nothing, so the assertion is on the hit existing at all);
  *  - heavy hitters: the complete-mode global aggregate's Misra-Gries
  *    sketch (a custom `TypedImperativeAggregate` — restart exercises
  *    its serialize/deserialize/merge) must carry phase-1 candidates
  *    and totals into phase 2's answer;
  *  - debounce: the per-key `LastSeen` timestamp must suppress a
  *    duplicate arriving after the restart inside the quiet window of a
  *    pre-restart event (lost state re-emits it as a fresh key);
  *  - gap detect: a gap opened by the first post-restart tick must be
  *    anchored at the pre-restart tick's restored timestamp (lost state
  *    emits no gap at all);
  *  - dedup: the ENGINE-managed dropDuplicatesWithinWatermark state must
  *    keep dropping a row redelivered across the restart (lost state
  *    emits it twice into the exactly-once sink).
  * Each phase is its own file-source batch; the 2030 sentinel advances
  * the watermark so append-mode state machines flush (FIXTURES.md
  * replay convention).
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Append one micro-batch of input, then run the query from its
    * checkpoint into the exactly-once parquet sink until drained.
    */
  private def phase(in: Path, out: Path, ck: Path, schema: StructType,
                    rows: DataFrame)(build: DataFrame => DataFrame): Unit = {
    rows.write.mode("append").parquet(in.toString)
    val q = build(spark.readStream.schema(schema).parquet(in.toString))
      .writeStream.format("parquet").option("path", out.toString)
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }

  private def dirs(): (Path, Path, Path) = (
    Files.createTempDirectory("graft_rec_in"),
    Files.createTempDirectory("graft_rec_out"),
    Files.createTempDirectory("graft_rec_ck"))

  /** Each test's scratch (input parquet, sink, checkpoint WAL) is deleted
    * on the way out — /tmp accumulation skews later timing runs (the
    * hazard Bench.cleanStaleScratch exists for), and a failing run's
    * message already carries the full expected/got rows.
    */
  private def withDirs(body: (Path, Path, Path) => Unit): Unit = {
    val (in, out, ck) = dirs()
    try body(in, out, ck)
    finally {
      import scala.jdk.CollectionConverters._
      for (d <- Seq(in, out, ck))
        Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
    }
  }

  test("sessionize: a session spanning the restart merges into one row") {
   withDirs { (in, out, ck) =>
    val p1 = Seq(("u1", ts("2024-01-01 10:00:00")),
      ("u1", ts("2024-01-01 10:01:00"))).toDF("user_id", "ts")
    def build(st: DataFrame) = StreamingOps.streamingSessionize(
      st, gap = "5 minutes")
    // phase 1: two events, watermark 10:00:00 — the session is OPEN in
    // state and nothing has been emitted when the query stops
    phase(in, out, ck, p1.schema, p1)(build)
    // phase 2: a third event EXTENDS the session (within the gap of
    // 10:01), then the sentinel closes it via the watermark
    phase(in, out, ck, p1.schema, Seq(
      ("u1", ts("2024-01-01 10:02:00")),
      ("zz", ts("2030-01-01 00:00:00"))).toDF("user_id", "ts"))(build)
    val got = spark.read.parquet(out.toString)
      .filter(col("user_id") === "u1")
      .select("session_start", "session_end", "n_events")
      .as[(Timestamp, Timestamp, Long)].collect().toSeq
    // lost state would split u1 into two sessions (or count only the
    // post-restart event); restored state merges all three
    assert(got == Seq((ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:07:00"), 3L)),
      s"one merged session spanning the restart expected: $got")
   }
  }

  test("as-of attach: a post-restart event matches a pre-restart quote") {
   withDirs { (in, out, ck) =>
    // tagged union feed, the q338 layout: side 0 = quote, side 1 = event
    val p1 = Seq(("A", ts("2024-01-01 10:00:00"), 0, 0L, 1.5))
      .toDF("symbol", "ts", "side", "eventId", "value")
    def build(st: DataFrame) = StreamingOps.streamingAsof(
      st.filter(col("side") === 1)
        .select(col("symbol"), col("ts"), col("eventId"))
        .as[StreamingOps.AsofEvent],
      st.filter(col("side") === 0)
        .select(col("symbol"), col("ts"), col("value"))
        .as[StreamingOps.AsofQuote]).toDF()
    // phase 1: only the quote arrives — it lives in AsofState's buffer
    phase(in, out, ck, p1.schema, p1)(build)
    // phase 2: the event arrives after the restart; its only possible
    // match is the quote restored from the checkpoint
    phase(in, out, ck, p1.schema, Seq(
      ("A", ts("2024-01-01 10:00:30"), 1, 7L, 0.0))
      .toDF("symbol", "ts", "side", "eventId", "value"))(build)
    val got = spark.read.parquet(out.toString)
      .select("symbol", "eventId", "asofValue")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("A", 7L, Some(1.5))),
      s"the restored quote buffer must supply the match: $got")
   }
  }

  test("gap repair: a gap straddling the restart fills from restored carry") {
    gapRepairRecovery()
  }

  test("gap repair recovery on the RocksDB state store (the 100 TB provider)") {
    // HDFSBackedStateStore keeps every key on the executor heap; RocksDB
    // spills to local disk and is the provider a 100 TB/day feed runs —
    // the same custom-state machine must checkpoint, restart and fill
    // identically on it (exercises RocksDB snapshot upload + reload, and
    // the Avro/unsafe-row state round-trip through a different engine)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try gapRepairRecovery()
    finally spark.conf.set(key, prev)
  }

  test("near-dup: bucket ownership survives the restart (a post-restart " +
      "duplicate is attributed to the pre-restart owner)") {
   withDirs { (in, out, ck) =>
    // q341's operator: MinHash banding + per-(band, bh) BucketOwner state.
    // Phase 1 registers doc 1 as the owner of every one of its band
    // buckets and emits NOTHING (first arrival); the query stops with the
    // ownership only in the checkpoint. Phase 2 sends doc 2 with
    // IDENTICAL text — identical minhash, identical band hashes — so a
    // hit (2, dupOf = 1) on any band is only producible if BucketOwner
    // state was restored. Lost state would make doc 2 the fresh owner of
    // every bucket and the sink would stay EMPTY.
    val text = "alpha beta gamma delta epsilon zeta"
    val p1 = Seq((1L, text, ts("2024-01-01 10:00:00")))
      .toDF("doc_id", "text", "ts")
    def build(st: DataFrame) = StreamingOps.streamingNearDup(
      st, "doc_id", "text", "ts",
      numHashes = 64, bands = 16, shingleSize = 3).toDF()
    phase(in, out, ck, p1.schema, p1)(build)
    assert(spark.read.parquet(out.toString).isEmpty,
      "phase 1's sole doc must own its buckets silently")
    phase(in, out, ck, p1.schema,
      Seq((2L, text, ts("2024-01-01 10:00:30")))
        .toDF("doc_id", "text", "ts"))(build)
    val got = spark.read.parquet(out.toString)
      .select("docId", "dupOf").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)),
      s"restored ownership must attribute doc 2 to doc 1: $got")
   }
  }

  test("heavy hitters: the Misra-Gries sketch state round-trips the " +
      "checkpoint (complete-mode totals span the restart)") {
   withDirs { (in, out, ck) =>
    // q342's operator shape: a COMPLETE-mode global aggregation holding
    // the MG candidate sketch (a custom TypedImperativeAggregate — its
    // serialize/deserialize is exactly what a restart exercises) plus an
    // exact token total as streaming state. Phase 2's totals can only
    // include phase 1's tokens if the agg state was restored; lost state
    // would report total = 2 and forget `banana` entirely.
    graft.plans.GraftExtensions.register(spark)
    import graft.operators.TextAnalysis
    val _ = out // complete mode uses a memory sink; the parquet dir idles
    val p1 = Seq("apple apple banana").toDF("text")
    def run(name: String, rows: DataFrame): Unit = {
      rows.write.mode("append").parquet(in.toString)
      val q = spark.readStream.schema(p1.schema).parquet(in.toString)
        .select(transform(TextAnalysis.tokens(col("text")),
          t => xxhash64(t)).as("_wh"))
        .agg(call_function("misra_gries_keys", col("_wh"), lit(8))
            .as("cand"),
          sum(size(col("_wh")).cast("long")).as("total"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run("graft_mg_rec_p1", p1)
    run("graft_mg_rec_p2", Seq("apple cherry").toDF("text"))
    val row = spark.table("graft_mg_rec_p2").head()
    val cand = row.getSeq[Long](0).toSet
    val total = row.getLong(1)
    assert(total == 5L,
      s"restored agg state must count BOTH phases' tokens: total=$total")
    // capacity 8 >= 3 distinct tokens, so the merged sketch is exact:
    // all three distinct token hashes survive, including phase-1-only
    // `banana`
    val hashes = Seq("apple", "banana", "cherry").toDF("t")
      .select(xxhash64(col("t"))).as[Long].collect().toSet
    assert(hashes.subsetOf(cand),
      s"merged sketch must keep phase-1 candidates: $cand vs $hashes")
   }
  }

  test("debounce: the restored per-key timestamp suppresses a " +
      "post-restart duplicate") {
   withDirs { (in, out, ck) =>
    // q186's live form: ONE LastSeen timestamp per (user, type) key.
    // Phase 1 emits event 1 (first arrival on its key) and stops with
    // lastUs = 10:00:00 held only in the checkpoint. Phase 2's event 2
    // lands 3 s later — inside the 5 s quiet window of an event the
    // restarted query never processed — so suppressing it is only
    // possible with restored state; a lost checkpoint treats the key as
    // fresh and emits event 2. Event 3 at +7 s from event 2 must pass
    // either way (debounce compares against the previous EVENT, kept or
    // not), so the assertion isolates exactly the restored-state claim:
    // sink = {1, 3}, never {1, 2, 3}.
    val p1 = Seq((1L, "click", ts("2024-01-01 10:00:00"), 1L))
      .toDF("userId", "eventType", "ts", "eventId")
    def build(st: DataFrame) = StreamingOps.streamingDebounce(
      st.as[StreamingOps.DebEvent]).toDF()
    phase(in, out, ck, p1.schema, p1)(build)
    phase(in, out, ck, p1.schema, Seq(
      (1L, "click", ts("2024-01-01 10:00:03"), 2L),
      (1L, "click", ts("2024-01-01 10:00:10"), 3L),
      (999L, "zz", ts("2030-01-01 00:00:00"), 99L))
      .toDF("userId", "eventType", "ts", "eventId"))(build)
    val got = spark.read.parquet(out.toString)
      .filter(col("userId") === 1L)
      .select("eventId").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 3L),
      s"restored LastSeen must debounce the post-restart duplicate: $got")
   }
  }

  test("gap detect: a gap whose left edge predates the restart is " +
      "emitted from the restored timestamp") {
   withDirs { (in, out, ck) =>
    // streamingGapDetect's whole output is DERIVED from LastSeen: a
    // GapEvent exists only relative to the previous tick. Phase 1's
    // sole tick emits nothing and stops with lastUs = 10:00:00 in the
    // checkpoint; phase 2's tick at 10:03 opens a 2-slot gap whose left
    // edge (10:01) is computable only from the restored timestamp — a
    // lost checkpoint sees a first-ever tick and emits NO gap at all,
    // so the sink itself is the restored-state proof.
    val p1 = Seq(("A", ts("2024-01-01 10:00:00"), 1.0))
      .toDF("symbol", "ts", "close")
    def build(st: DataFrame) = StreamingOps.streamingGapDetect(
      st.as[StreamingOps.Tick], rule = "1T").toDF()
    phase(in, out, ck, p1.schema, p1)(build)
    assert(spark.read.parquet(out.toString).isEmpty,
      "phase 1's sole tick must emit no gap")
    phase(in, out, ck, p1.schema, Seq(
      ("A", ts("2024-01-01 10:03:00"), 2.0),
      ("Z", ts("2030-01-01 00:00:00"), 0.0)).toDF("symbol", "ts", "close"))(
      build)
    val got = spark.read.parquet(out.toString)
      .filter(col("symbol") === "A")
      .select("start", "end", "missingCount")
      .as[(Timestamp, Timestamp, Long)].collect().toSeq
    assert(got == Seq((ts("2024-01-01 10:01:00"),
      ts("2024-01-01 10:02:00"), 2L)),
      s"the gap must be anchored at the pre-restart tick: $got")
   }
  }

  test("dedup: the engine-managed duplicate state survives the restart " +
      "(a redelivered pre-restart row stays dropped)") {
   withDirs { (in, out, ck) =>
    // q333's operator: dropDuplicatesWithinWatermark — the dedup state
    // here is ENGINE-managed (no custom state class), and the restart
    // must restore it all the same. Phase 1 emits (A, 10:00) and stops
    // with the key in the checkpoint; phase 2 redelivers the SAME row —
    // an at-least-once upstream replaying across the restart — plus a
    // genuinely new row. Restored state drops the redelivery; lost state
    // emits it a second time into the exactly-once sink.
    val p1 = Seq(("A", ts("2024-01-01 10:00:00"), 1.0))
      .toDF("symbol", "ts", "close")
    def build(st: DataFrame) = StreamingOps.streamingDedup(
      st, tsCol = "ts", symbolCol = "symbol")
    phase(in, out, ck, p1.schema, p1)(build)
    phase(in, out, ck, p1.schema, Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:30"), 2.0),
      ("Z", ts("2030-01-01 00:00:00"), 0.0)).toDF("symbol", "ts", "close"))(
      build)
    val got = spark.read.parquet(out.toString)
      .filter(col("symbol") === "A")
      .select("ts", "close").as[(Timestamp, Double)]
      .collect().toSeq.sortBy(_._1.getTime)
    assert(got == Seq((ts("2024-01-01 10:00:00"), 1.0),
      (ts("2024-01-01 10:00:30"), 2.0)),
      s"the redelivered pre-restart row must stay dropped: $got")
   }
  }

  test("a replay-based gate query restores the session's shuffle partitioning") {
    // the replay harness plans its streaming query at its own state
    // partition count and MUST hand the session back unchanged — a
    // leaked setting would silently re-plan every later batch query in a
    // Verify/Bench run at the replay width
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    SparkEntry.queries("q331_streaming_sessionize")(
      spark, "/root/testdata/sf0.001").count()
    assert(spark.conf.get(key) == prev,
      s"session left at ${spark.conf.get(key)} instead of $prev")
  }

  private def gapRepairRecovery(): Unit = {
   withDirs { (in, out, ck) =>
    val p1 = Seq(("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:03:00"), 4.0)).toDF("symbol", "ts", "close")
    def build(st: DataFrame) = StreamingOps.streamingGapRepair(
      st.as[StreamingOps.Tick], rule = "1T").toDF()
    // phase 1: watermark 10:02 — the 10:03 tick is still PENDING in
    // RepairState when the query stops
    phase(in, out, ck, p1.schema, p1)(build)
    // phase 2: the next tick opens a gap whose LEFT edge (10:03, 4.0)
    // predates the restart; the 10:04 fill value proves the pending
    // buffer and ffill carry were restored
    phase(in, out, ck, p1.schema, Seq(
      ("A", ts("2024-01-01 10:05:00"), 7.0),
      ("Z", ts("2030-01-01 00:00:00"), 0.0)).toDF("symbol", "ts", "close"))(build)
    val got = spark.read.parquet(out.toString)
      .filter(col("symbol") === "A")
      .select("ts", "close", "generated")
      .as[(Timestamp, Double, Boolean)].collect().toSeq.sortBy(_._1.getTime)
    assert(got == Seq(
      (ts("2024-01-01 10:00:00"), 1.0, false),
      (ts("2024-01-01 10:01:00"), 1.0, true),
      (ts("2024-01-01 10:02:00"), 1.0, true),
      (ts("2024-01-01 10:03:00"), 4.0, false),
      (ts("2024-01-01 10:04:00"), 4.0, true),
      (ts("2024-01-01 10:05:00"), 7.0, false)),
      s"full repaired grid across the restart expected: $got")
   }
  }
}

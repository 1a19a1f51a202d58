package graft

import java.sql.Timestamp
import java.time.Instant

import graft.operators.{AsofJoin, Multimodal, Similarity}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Contracts for the multimodal plumbing, streaming operators, IVF index
  * and the as-of join.
  */
class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal: probe/features/resize/frames flow through binary columns") {
    val media = Multimodal.syntheticMedia(spark, 20).cache()
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)

    val probed = Multimodal.probeMedia(media)
    val p = probed.orderBy("media_id").collect()
    assert(p.length == 20)
    assert(p.forall(r => r.getAs[Int]("probe_width") >= 64))
    // deterministic: same payload -> same probe
    val p2 = Multimodal.probeMedia(media).orderBy("media_id").collect()
    assert(p.map(_.getAs[Int]("probe_width")).toSeq ==
      p2.map(_.getAs[Int]("probe_width")).toSeq)

    val feats = Multimodal.extractFeatures(media, dim = 32)
    val f = feats.select("embedding").collect()
    assert(f.forall(_.getSeq[Float](0).length == 32))
    // features feed straight into similarity search
    val top = Similarity.topK(
      feats.filter($"media_id" === 0).select($"media_id", $"embedding"),
      feats.select($"media_id", $"embedding"),
      "media_id", "media_id", "embedding", k = 3)
    assert(top.count() == 3)

    val resized = Multimodal.resizeMedia(media, 224, 224)
    val r0 = resized.orderBy("media_id").first()
    assert(new String(r0.getAs[Array[Byte]]("payload").take(12))
      .startsWith("RSZ:224x224:"))
    assert(r0.getStruct(r0.fieldIndex("meta")).getAs[Int]("width") == 224)

    val frames = Multimodal.sampleFrames(media, framesPerItem = 4)
    assert(frames.count() == 80)
    assert(frames.groupBy("media_id").count()
      .filter($"count" =!= 4).count() == 0)
  }

  test("media probe parses real PNG/GIF/JPEG headers; text falls back to digest") {
    import graft.operators.Multimodal.MediaCodec
    // PNG: signature + IHDR length/type, width 640, height 480, bit depth
    // 8, color type 6 (truecolor+alpha -> 4 channels)
    val png = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0).map(_.toByte)
    assert(MediaCodec.probe(png) == ((640, 480, 4)))
    // GIF89a: little-endian logical screen 320x200
    val gif = ("GIF89a".getBytes.map(_.toInt) ++
      Array(0x40, 0x01, 0xc8, 0x00)).map(_.toByte)
    assert(MediaCodec.probe(gif) == ((320, 200, 3)))
    // JPEG: SOI, APP0 (skipped via its length), SOF0 with height 120,
    // width 80, 3 components
    val jpg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 0x78, 0x00, 0x50, 3).map(_.toByte)
    assert(MediaCodec.probe(jpg) == ((80, 120, 3)))
    // truncated PNG signature: not parseable -> digest fallback, in range
    val txt = "plain text payload".getBytes
    assert(MediaCodec.parseHeader(txt).isEmpty)
    val (w, h, c) = MediaCodec.probe(txt)
    assert(w >= 64 && w < 192 && h >= 64 && h < 192 && c == 3)
  }

  test("stream-stream interval join equals the batch range join") {
    implicit val sc = spark.sqlContext
    def ts(min: Int) = Timestamp.from(
      Instant.parse(f"2024-01-01T${min / 60}%02d:${min % 60}%02d:00Z"))
    val rnd = new scala.util.Random(31L)
    // feed in event-time order: a batch older than the watermark would be
    // (correctly) dropped as late, which is not what this pins
    val purchases = (0 until 40).map(i =>
      (1L + rnd.nextInt(5), ts(rnd.nextInt(200)), i.toLong))
      .sortBy(_._2.getTime)
    val clicks = (0 until 120).map(i =>
      (1L + rnd.nextInt(5), ts(rnd.nextInt(200)), 1000L + i))
      .sortBy(_._2.getTime)

    val pm = MemoryStream[(Long, Timestamp, Long)]
    val cm = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingOps.streamingIntervalJoin(
      pm.toDF().toDF("p_user", "pts", "pid"),
      cm.toDF().toDF("c_user", "cts", "cid"),
      "p_user", "c_user", "pts", "cts", lookback = "30 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    // feed in two chunks + a watermark-advancing tail so buffered
    // matches on both sides flush
    pm.addData(purchases.take(20): _*); cm.addData(clicks.take(60): _*)
    q.processAllAvailable()
    pm.addData(purchases.drop(20): _*); cm.addData(clicks.drop(60): _*)
    q.processAllAvailable()
    pm.addData((99L, ts(600), 9999L)); cm.addData((99L, ts(600), 9998L))
    q.processAllAvailable()
    val got = spark.table("ssj_out")
      .filter(col("pid") < 9000)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()

    val batch = purchases.toDF("p_user", "pts", "pid")
      .join(clicks.toDF("c_user", "cts", "cid"),
        col("p_user") === col("c_user") &&
          col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
          col("cts") <= col("pts"))
      .filter(col("pid") < 9000)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce matches")
    assert(got == batch,
      s"missing=${(batch -- got).take(5)} extra=${(got -- batch).take(5)}")
  }

  test("streaming resample: tumbling event-time windows over a memory stream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double, Double, String)]
    val stream = mem.toDF()
      .toDF("TIMESTAMP", "CLOSE", "VOLUME", "SYMBOL")
    val agged = StreamingOps.streamingResample(stream, "5T")
    val q = agged.writeStream.format("memory")
      .queryName("resample_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    // two complete 5-min buckets, then late-watermark flush data
    mem.addData((0 until 10).map(m => (ts(m), 10.0 + m, 100.0, "EURUSD")): _*)
    q.processAllAvailable()
    mem.addData((ts(30), 99.0, 1.0, "EURUSD")) // advances watermark past 0-10
    q.processAllAvailable()
    val out = spark.table("resample_out").orderBy("TIMESTAMP").collect()
    q.stop()
    assert(out.length >= 2, s"two closed buckets emitted, got ${out.length}")
    val b0 = out(0)
    assert(b0.getAs[Timestamp]("TIMESTAMP") == ts(0))
    assert(b0.getAs[Double]("CLOSE") == 14.0)
    assert(b0.getAs[Double]("VOLUME") == 500.0)
  }

  test("streaming aggState equals the batch state table after every batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("k", "v")
    val q = StreamingOps.streamingAggState(stream, "k", "v")
      .writeStream.format("memory").queryName("aggstate_out")
      .outputMode("complete").start()
    val batch1 = Seq((1L, 2.5), (1L, -1.0), (2L, 7.0))
    val batch2 = Seq((1L, 4.0), (3L, 0.5))
    def snapshot(): Seq[(Long, Long, Double, Double, Double)] =
      spark.table("aggstate_out").orderBy("k")
        .select(col("k"), col("n"), col("s").cast("double"),
          col("mn"), col("mx"))
        .as[(Long, Long, Double, Double, Double)].collect().toSeq
    def batchState(rows: Seq[(Long, Double)]) =
      graft.operators.Analytics.aggState(rows.toDF("k", "v"), "k", "v")
        .orderBy("k")
        .select(col("k"), col("n"), col("s").cast("double"),
          col("mn"), col("mx"))
        .as[(Long, Long, Double, Double, Double)].collect().toSeq
    mem.addData(batch1: _*)
    q.processAllAvailable()
    assert(snapshot() == batchState(batch1))
    mem.addData(batch2: _*)
    q.processAllAvailable()
    assert(snapshot() == batchState(batch1 ++ batch2),
      "streaming state must equal one-pass batch aggregation (q115 invariant)")
    q.stop()
  }

  test("streaming latest-change state mirrors batch applyChangelog") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Double, Timestamp, String)]
    val stream = mem.toDF().toDF("k", "v", "ts", "op")
    val q = StreamingOps.streamingLatestChange(stream, "k", "v", "ts", "op")
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("complete").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    val rows = Seq(
      (1L, 11.0, ts(1), "U"), (1L, 12.0, ts(2), "U"), // latest U wins
      (2L, 20.0, ts(1), "U"), (2L, 0.0, ts(3), "D"),  // delete wins
      (3L, 30.0, ts(5), "U"))
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val live = spark.table("cdc_out").filter(col("op") =!= "D")
      .select(col("k"), col("v")).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    q.stop()
    // batch equivalent: empty snapshot, the whole stream as changelog
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val chg = rows.toDF("k", "v", "ts", "op")
    val batch = graft.operators.Analytics
      .applyChangelog(empty, chg, "k", "v", "ts", "op")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(live == batch && live == Seq((1L, 12.0), (3L, 30.0)))
  }

  test("streaming dedup: duplicate ticks within the watermark drop, first wins") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double, String)]
    val stream = mem.toDF().toDF("TIMESTAMP", "CLOSE", "SYMBOL")
    val deduped = StreamingOps.streamingDedup(stream)
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    mem.addData((ts(0), 1.0, "EURUSD"), (ts(1), 1.1, "EURUSD"))
    q.processAllAvailable()
    // same stamps again (a feed replay) + a fresh stamp
    mem.addData((ts(0), 9.9, "EURUSD"), (ts(1), 8.8, "EURUSD"),
      (ts(2), 1.2, "EURUSD"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").orderBy("TIMESTAMP").collect()
    q.stop()
    assert(out.length == 3, s"3 distinct stamps, got ${out.length}")
    assert(out(0).getAs[Double]("CLOSE") == 1.0, "first arrival wins")
    assert(out(1).getAs[Double]("CLOSE") == 1.1)
  }

  test("streaming notSeen drops seen texts stateless, passes fresh ones") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val seen = (0 until 100).map(i => (i.toLong, s"seen text $i"))
      .toDF("id", "text")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("id", "text")
    val out = StreamingOps.streamingNotSeen(stream, seen, "text",
      expectedSeen = 100L)
    val q = out.writeStream.format("memory")
      .queryName("notseen_out").outputMode("append").start()
    mem.addData((1000L, "seen text 5"), (1001L, "genuinely fresh one"),
      (1002L, "seen text 99"), (1003L, "another fresh doc"))
    q.processAllAvailable()
    val got = spark.table("notseen_out").select("id")
      .as[Long].collect().sorted
    q.stop()
    assert(got.toSeq == Seq(1001L, 1003L),
      s"only fresh texts pass the bloom screen, got ${got.toSeq}")
  }

  test("streaming near-dup: band-bucket state flags the later twin, matches batch LSH") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val base = (0 until 30).map(i => s"token$i").mkString(" ")
    val twin = (0 until 30).map(i => if (i == 29) "changed" else s"token$i")
      .mkString(" ")
    val other = (0 until 30).map(i => s"else$i").mkString(" ")
    // batch truth first: the LSH pair generator finds (1,2) and nothing else
    val statics = Seq((1L, base), (2L, twin), (3L, other)).toDF("id", "text")
    val batchPairs = graft.operators.Dedup
      .minHashLshPairs(statics, "id", "text", threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L)), s"batch LSH pairs: $batchPairs")

    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    val hits = StreamingOps.streamingNearDup(stream, "doc_id", "text", "ts")
    val q = hits.writeStream.format("memory")
      .queryName("neardup_out").outputMode("append").start()
    mem.addData((1L, base, ts(0)))
    q.processAllAvailable()
    mem.addData((2L, twin, ts(1)), (3L, other, ts(1)))
    q.processAllAvailable()
    // a re-crawl of the original far later still resolves to owner 1
    mem.addData((4L, base, ts(5)))
    q.processAllAvailable()
    val out = spark.table("neardup_out")
      .select("docId", "dupOf").as[(Long, Long)].collect().toSeq
    q.stop()
    assert(out.nonEmpty && out.forall(_._2 == 1L),
      s"every hit names the first claimant as keeper: $out")
    val flagged = out.map(_._1).toSet
    assert(flagged == Set(2L, 4L),
      s"twin and re-crawl flagged, the distinct doc is not: $flagged")
  }

  test("streaming sessionize: quiet gap closes a session; state finalizes by watermark") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "user_id")
    val out = StreamingOps.streamingSessionize(stream, gap = "5 minutes",
      delay = "1 minute")
    val q = out.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    // burst of 3 events, a >5-min quiet gap, a second burst, then an
    // advancing event that pushes the watermark past both sessions
    mem.addData((ts(0), "u1"), (ts(2), "u1"), (ts(4), "u1"))
    q.processAllAvailable()
    mem.addData((ts(15), "u1"), (ts(16), "u1"))
    q.processAllAvailable()
    mem.addData((ts(45), "u1"))
    q.processAllAvailable()
    val rows = spark.table("sess_out").orderBy("session_start").collect()
    q.stop()
    assert(rows.length == 2, s"two closed sessions, got ${rows.length}")
    assert(rows(0).getAs[Long]("n_events") == 3 &&
      rows(0).getAs[Timestamp]("session_start") == ts(0))
    assert(rows(1).getAs[Long]("n_events") == 2 &&
      rows(1).getAs[Timestamp]("session_start") == ts(15))
  }

  test("streaming gap detect: keyed state emits gap events") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Tick]
    val gaps = StreamingOps.streamingGapDetect(mem.toDS(), "1T")
    val q = gaps.writeStream.format("memory")
      .queryName("gap_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    mem.addData(StreamingOps.Tick("EURUSD", ts(0), 1.0),
      StreamingOps.Tick("EURUSD", ts(1), 1.1))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("EURUSD", ts(5), 1.2)) // 3-stamp gap
    q.processAllAvailable()
    val out = spark.table("gap_out").collect()
    q.stop()
    assert(out.length == 1)
    assert(out(0).getAs[Timestamp]("start") == ts(2))
    assert(out(0).getAs[Timestamp]("end") == ts(4))
    assert(out(0).getAs[Long]("missingCount") == 3L)
  }

  test("streaming gap detect: quiet symbols retire; post-retirement ticks restart fresh") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Tick]
    val gaps = StreamingOps.streamingGapDetect(mem.toDS(), "1T",
      retention = "10 minutes")
    val q = gaps.writeStream.format("memory")
      .queryName("gap_retire_out").outputMode("append").start()
    def ts(hm: (Int, Int)) = Timestamp.from(
      Instant.parse(f"2024-01-01T${hm._1}%02d:${hm._2}%02d:00Z"))
    // A ticks at 0:00/0:01, then goes quiet; B pushes the watermark an hour
    // ahead (past A's 10-minute horizon), the extra batch fires A's timeout
    mem.addData(StreamingOps.Tick("A", ts((0, 0)), 1.0),
      StreamingOps.Tick("A", ts((0, 1)), 1.1))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("B", ts((1, 30)), 2.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("B", ts((1, 31)), 2.1))
    q.processAllAvailable()
    // A returns: retired state means a fresh start — NO GapEvent spanning
    // the quiet 0:01→1:40 stretch (the documented bounded-state trade)
    mem.addData(StreamingOps.Tick("A", ts((1, 40)), 1.2))
    q.processAllAvailable()
    val out = spark.table("gap_retire_out").collect()
    q.stop()
    assert(out.isEmpty,
      s"no gap may be emitted for a retired symbol, got ${out.mkString(";")}")
  }

  test("streaming gap repair: missing grid stamps fill with the carried value") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Tick]
    val rep = StreamingOps.streamingGapRepair(mem.toDS(), "1T")
    val q = rep.writeStream.format("memory")
      .queryName("repair_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    mem.addData(StreamingOps.Tick("EURUSD", ts(0), 1.0),
      StreamingOps.Tick("EURUSD", ts(1), 1.5),
      StreamingOps.Tick("EURUSD", ts(4), 2.0))
    q.processAllAvailable()
    // watermark still trails: nothing final yet — push it past min 4, then
    // one more tick so the group runs again UNDER the advanced watermark
    // (finalization happens on the symbol's next invocation)
    mem.addData(StreamingOps.Tick("EURUSD", ts(30), 9.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("EURUSD", ts(31), 9.1))
    q.processAllAvailable()
    val out = spark.table("repair_out").collect()
      .map(r => (r.getAs[Timestamp]("ts"), r.getAs[Double]("close"),
        r.getAs[Boolean]("generated"))).sortBy(_._1.getTime)
    q.stop()
    // minutes 2 and 3 synthesize with min-1's value carried forward
    assert(out.toSeq == Seq(
      (ts(0), 1.0, false), (ts(1), 1.5, false),
      (ts(2), 1.5, true), (ts(3), 1.5, true),
      (ts(4), 2.0, false)), s"got ${out.mkString(";")}")
  }

  test("streaming gap repair: a late tick slots into its true grid position") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Tick]
    val rep = StreamingOps.streamingGapRepair(mem.toDS(), "1T",
      delay = "10 minutes")
    val q = rep.writeStream.format("memory")
      .queryName("repair_late_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    // min 0 and min 4 arrive first; min 2 arrives one batch LATER but
    // within the 10-minute lateness bound (watermark is still at -10 + 4)
    mem.addData(StreamingOps.Tick("EURUSD", ts(0), 1.0),
      StreamingOps.Tick("EURUSD", ts(4), 2.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("EURUSD", ts(2), 5.0))
    q.processAllAvailable()
    // advance the watermark past min 4, then nudge the group once more so
    // it finalizes under the advanced watermark
    mem.addData(StreamingOps.Tick("EURUSD", ts(30), 9.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("EURUSD", ts(31), 9.1))
    q.processAllAvailable()
    val out = spark.table("repair_late_out").collect()
      .map(r => (r.getAs[Timestamp]("ts"), r.getAs[Double]("close"),
        r.getAs[Boolean]("generated"))).sortBy(_._1.getTime)
    q.stop()
    // the late min-2 tick is REAL in the output and the fills bridge its
    // actual neighbors: 1 carries min 0, 3 carries min 2 — a buffer-less
    // repair would have filled 1-3 from min 0 before min 2 ever arrived
    assert(out.toSeq == Seq(
      (ts(0), 1.0, false), (ts(1), 1.0, true),
      (ts(2), 5.0, false), (ts(3), 5.0, true),
      (ts(4), 2.0, false)), s"got ${out.mkString(";")}")
  }

  test("streaming gap repair: retirement flushes pending ticks, then restarts fresh") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Tick]
    val rep = StreamingOps.streamingGapRepair(mem.toDS(), "1T",
      retention = "10 minutes")
    val q = rep.writeStream.format("memory")
      .queryName("repair_retire_out").outputMode("append").start()
    def ts(hm: (Int, Int)) = Timestamp.from(
      Instant.parse(f"2024-01-01T${hm._1}%02d:${hm._2}%02d:00Z"))
    // A ticks at 0:00/0:02 then goes quiet; B drives the watermark far
    // past A's 10-minute retention, firing A's timeout
    mem.addData(StreamingOps.Tick("A", ts((0, 0)), 1.0),
      StreamingOps.Tick("A", ts((0, 2)), 2.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("B", ts((1, 30)), 7.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("B", ts((1, 31)), 7.1))
    q.processAllAvailable()
    // A returns after retirement: fresh series, NO fill across the quiet
    // hour (bounded-state trade, same as gap detect)
    mem.addData(StreamingOps.Tick("A", ts((1, 40)), 3.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("B", ts((3, 0)), 8.0)) // finalize A's 1:40
    q.processAllAvailable()
    val a = spark.table("repair_retire_out").collect()
      .filter(_.getAs[String]("symbol") == "A")
      .map(r => (r.getAs[Timestamp]("ts"), r.getAs[Double]("close"),
        r.getAs[Boolean]("generated"))).sortBy(_._1.getTime)
    q.stop()
    // the flush emits 0:00, the 0:01 fill, 0:02 — buffered rows are not
    // lost at retirement — and 1:40 restarts with no bridging fills
    assert(a.toSeq == Seq(
      (ts((0, 0)), 1.0, false), (ts((0, 1)), 1.0, true),
      (ts((0, 2)), 2.0, false), (ts((1, 40)), 3.0, false)),
      s"got ${a.mkString(";")}")
  }

  test("streaming interpolation matches the batch linear repair on a gappy late stream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingOps.Tick]
    val rep = StreamingOps.streamingGapInterpolate(mem.toDS(), "1T",
      delay = "10 minutes")
    val q = rep.writeStream.format("memory")
      .queryName("interp_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    // min 0 and min 6 arrive first; min 2 arrives a batch LATE (inside the
    // lateness bound). A repair that blended 1-5 from (0,6) before min 2
    // landed would be wrong twice over — the buffered engine blends
    // (0,2) and (2,6) instead, and only once the closing edges are final.
    mem.addData(StreamingOps.Tick("EURUSD", ts(0), 1.0),
      StreamingOps.Tick("EURUSD", ts(6), 3.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("EURUSD", ts(2), 5.0))
    q.processAllAvailable()
    // advance the watermark past min 6, then nudge the group once more so
    // it finalizes under the advanced watermark
    mem.addData(StreamingOps.Tick("EURUSD", ts(30), 9.0))
    q.processAllAvailable()
    mem.addData(StreamingOps.Tick("EURUSD", ts(31), 9.1))
    q.processAllAvailable()
    val got = spark.table("interp_out").collect()
      .map(r => (r.getAs[Timestamp]("ts"), r.getAs[Double]("close"),
        r.getAs[Boolean]("generated"))).sortBy(_._1.getTime)
    q.stop()

    // batch oracle: the same series on the reindexed grid through
    // Interpolate.linear (O13's interpolation half)
    import spark.implicits._
    val grid = Seq(
      (ts(0), Some(1.0)), (ts(1), None), (ts(2), Some(5.0)), (ts(3), None),
      (ts(4), None), (ts(5), None), (ts(6), Some(3.0))
    ).toDF("ts", "close")
    val batch = graft.operators.Interpolate
      .linear(grid, Seq("close"), "ts")
      .orderBy("ts").collect()
      .map(r => (r.getAs[Timestamp]("ts"), r.getAs[Double]("close")))
    assert(got.length == batch.length &&
      got.zip(batch).forall { case ((st, sv, _), (bt, bv)) =>
        st == bt && math.abs(sv - bv) < 1e-12 },
      s"stream ${got.mkString(";")} vs batch ${batch.mkString(";")}")
    // and the generated flags mark exactly the synthesized stamps
    assert(got.filter(_._3).map(_._1).toSeq == Seq(ts(1), ts(3), ts(4), ts(5)))
  }

  test("streaming as-of: events attach the latest at-or-before quote") {
    implicit val sc = spark.sqlContext
    val evMem = MemoryStream[StreamingOps.AsofEvent]
    val qtMem = MemoryStream[StreamingOps.AsofQuote]
    val out = StreamingOps.streamingAsof(evMem.toDS(), qtMem.toDS())
    val q = out.writeStream.format("memory")
      .queryName("asof_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    // batch 1: out-of-order within the batch — the merge scan must reorder
    qtMem.addData(StreamingOps.AsofQuote("EURUSD", ts(4), 100.0))
    evMem.addData(
      StreamingOps.AsofEvent("EURUSD", ts(5), 1L),
      StreamingOps.AsofEvent("EURUSD", ts(3), 2L), // before any quote
      StreamingOps.AsofEvent("EURUSD", ts(4), 3L)) // equal stamp: quote wins
    q.processAllAvailable()
    // batch 2: state carries the ts(4) quote; a newer quote supersedes it
    qtMem.addData(StreamingOps.AsofQuote("EURUSD", ts(8), 200.0))
    evMem.addData(
      StreamingOps.AsofEvent("EURUSD", ts(7), 4L), // old quote from state
      StreamingOps.AsofEvent("EURUSD", ts(9), 5L)) // new quote
    q.processAllAvailable()
    val rows = spark.table("asof_out").orderBy("eventId").collect()
    q.stop()
    assert(rows.length == 5)
    def v(i: Int): Option[Double] =
      if (rows(i).isNullAt(rows(i).fieldIndex("asofValue"))) None
      else Some(rows(i).getAs[Double]("asofValue"))
    assert(v(0).contains(100.0)) // e@5 <- q@4
    assert(v(1).isEmpty)         // e@3: no quote at-or-before
    assert(v(2).contains(100.0)) // e@4: equal stamp eligible (<=)
    assert(v(3).contains(100.0)) // e@7 <- state-carried q@4
    assert(v(4).contains(200.0)) // e@9 <- q@8
  }

  test("streaming as-of: a late event matches an OLDER quote across batches") {
    implicit val sc = spark.sqlContext
    val evMem = MemoryStream[StreamingOps.AsofEvent]
    val qtMem = MemoryStream[StreamingOps.AsofQuote]
    val out = StreamingOps.streamingAsof(evMem.toDS(), qtMem.toDS())
    val q = out.writeStream.format("memory")
      .queryName("asof_late_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    def tss(min: Int, sec: Int) =
      Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:$sec%02dZ"))
    // batch 1: two quotes, no events — watermark lands between them (8')
    qtMem.addData(
      StreamingOps.AsofQuote("EURUSD", ts(4), 100.0),
      StreamingOps.AsofQuote("EURUSD", ts(9), 200.0))
    q.processAllAvailable()
    // batch 2: event OLDER than the newest quote but above the watermark —
    // its true at-or-before quote is q@4, which a newest-quote-only state
    // would have discarded
    evMem.addData(StreamingOps.AsofEvent("EURUSD", tss(8, 30), 1L))
    q.processAllAvailable()
    val rows = spark.table("asof_late_out").collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("asofValue") == 100.0,
      "late event must see the buffered older quote, not null")
  }

  test("streaming as-of: quiet symbols retire after the retention horizon") {
    implicit val sc = spark.sqlContext
    val evMem = MemoryStream[StreamingOps.AsofEvent]
    val qtMem = MemoryStream[StreamingOps.AsofQuote]
    val out = StreamingOps.streamingAsof(evMem.toDS(), qtMem.toDS(),
      retention = "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("asof_retire_out").outputMode("append").start()
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    // batch 1: symbol A gets a quote; its timeout arms at q@4 + 10' = 14'
    qtMem.addData(StreamingOps.AsofQuote("A", ts(4), 100.0))
    q.processAllAvailable()
    // batches 2-3: symbol B advances the global watermark far past A's
    // horizon; the extra batch gives the timed-out group its firing trigger
    evMem.addData(StreamingOps.AsofEvent("B", ts(30), 1L))
    q.processAllAvailable()
    evMem.addData(StreamingOps.AsofEvent("B", ts(31), 2L))
    q.processAllAvailable()
    // batch 4: a FRESH event on A (above the watermark) — had the state
    // survived, q@4 would match; retirement means no quote
    evMem.addData(StreamingOps.AsofEvent("A", ts(32), 3L))
    q.processAllAvailable()
    val rows = spark.table("asof_retire_out").orderBy("eventId").collect()
    q.stop()
    assert(rows.length == 3)
    assert(rows(2).getAs[String]("symbol") == "A")
    assert(rows(2).isNullAt(rows(2).fieldIndex("asofValue")),
      "retired symbol's events get no match (quote drop)")
  }

  test("IVF top-k finds the planted duplicate with bounded probes") {
    val rnd = new scala.util.Random(3)
    def vec(): Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    val v0 = vec()
    val rows = Seq((0L, v0), (1L, v0.map(_ + 0.001))) ++
      (2L until 100L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val top = Similarity.ivfTopK(df.filter($"vec_id" === 0), df,
      "vec_id", "vec_id", "embedding", k = 3, nLists = 8, nProbe = 3)
      .orderBy("rn").collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[Long]("cid") == 1L,
      "clone lands in a probed bucket and ranks first")
  }

  test("IVF-PQ: exhaustive probe equals plain ADC; pruning keeps exact ADC on the subset") {
    val rnd = new scala.util.Random(17)
    def vec(): Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    val df = (0L until 120L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Double]("adc"), r.getAs[Long]("rank"))
    // probing every list must reproduce plain PQ ADC bit-for-bit: the
    // coarse stage may only PRUNE, never change a distance or a rank
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      m = 4, k = 8, iterations = 2)
    val enc = Similarity.pqEncode(df, "vec_id", "embedding", books)
    val plain = Similarity.pqAdcTopK(q, enc, "vec_id", "embedding",
      books, k = 5).collect().map(key).toSet
    val full = Similarity.ivfPqTopK(q, df, "vec_id", "vec_id", "embedding",
      k = 5, nLists = 4, nProbe = 4, m = 4, kCodes = 8,
      ivfIterations = 1, pqIterations = 2).collect().map(key).toSet
    assert(full == plain, s"missing=${(plain -- full).take(3)} " +
      s"extra=${(full -- plain).take(3)}")
    // pruned probes: every returned pair carries the SAME snapped ADC the
    // exhaustive ranking assigns it — pruning narrows the candidate set,
    // it must not perturb a single distance
    val allAdc = Similarity.pqAdcTopK(q, enc, "vec_id", "embedding",
        books, k = 1000).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")) ->
        r.getAs[Double]("adc")).toMap
    val pruned = Similarity.ivfPqTopK(q, df, "vec_id", "vec_id", "embedding",
      k = 5, nLists = 4, nProbe = 1, m = 4, kCodes = 8,
      ivfIterations = 1, pqIterations = 2).collect()
    assert(pruned.nonEmpty)
    for (r <- pruned) {
      val k2 = (r.getAs[Long]("qid"), r.getAs[Long]("cid"))
      assert(allAdc(k2) == r.getAs[Double]("adc"),
        s"$k2: pruned adc ${r.getAs[Double]("adc")} != exhaustive ${allAdc(k2)}")
    }
  }

  test("as-of join attaches the latest at-or-before right row per key") {
    def ts(min: Int) = Timestamp.from(Instant.parse(f"2024-01-01T00:$min%02d:00Z"))
    val events = Seq(
      (1L, ts(5), "e1"), (1L, ts(10), "e2"), (2L, ts(3), "e3"))
      .toDF("user_id", "ts", "name")
    val quotes = Seq(
      (1L, ts(4), 100.0), (1L, ts(8), 200.0), (3L, ts(1), 999.0))
      .toDF("user_id", "qts", "price")
    val out = AsofJoin.asof(events, quotes, Seq("user_id"),
        "ts", "qts", pickCols = Seq("price"))
      .orderBy("user_id", "ts").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("asof_price") == 100.0) // e1@5 <- quote@4
    assert(out(1).getAs[Double]("asof_price") == 200.0) // e2@10 <- quote@8
    assert(out(2).isNullAt(out(2).fieldIndex("asof_price"))) // no quote <= 3

    // boundary: right row exactly AT the left ts is eligible (<=)
    val eq = AsofJoin.asof(
      Seq((1L, ts(4), "e")).toDF("user_id", "ts", "name"),
      quotes, Seq("user_id"), "ts", "qts", Seq("price")).collect()
    assert(eq(0).getAs[Double]("asof_price") == 100.0)
  }

  test("as-of join agrees with the decorrelated q12 form on real data") {
    val d = "/root/testdata/sf0.001"
    val events = graft.core.Tables.events(spark, d)
      .select($"event_id", $"user_id", $"ts")
    val orders = graft.core.Tables.orders(spark, d)
      .select($"o_custkey", $"o_orderdate")
    // operator needs the same key name on both sides
    val viaOp = AsofJoin.asof(events,
        orders.withColumnRenamed("o_custkey", "user_id"),
        Seq("user_id"), "ts", "o_orderdate", Seq("o_orderdate"))
      .select($"event_id",
        date_format($"asof_o_orderdate", "yyyy-MM-dd HH:mm:ss").as("asof_order"))
    val viaJoin = graft.queries.RelationalQueries.defs("q12_asof_join")(spark, d)
      .select($"event_id",
        date_format($"asof_order", "yyyy-MM-dd HH:mm:ss").as("asof_order"))
    val b = viaJoin.orderBy("event_id").collect() // q12 carries LIMIT 500
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString)))
    val bIds = b.map(_._1).toSet
    val a = viaOp.orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString)))
      .filter(x => bIds.contains(x._1))
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) => x == y },
      "operator and decorrelated forms agree row-for-row")
  }

  test("streaming debounce matches the batch lag rule; quiet keys retire state") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import StreamingOps.DebEvent
    def ts(sec: Int) = Timestamp.from(
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))
    // u1/click: 0s keeps (no prev), 3s drops (gap 3 ≤ 5), 9s keeps
    // (gap from the previous EVENT at 3s is 6 > 5 — the dropped event
    // still counts as "previous"), 12s drops (gap 3 from 9s).
    val rows = Seq(
      DebEvent(1L, "click", ts(0), 1L), DebEvent(1L, "click", ts(3), 2L),
      DebEvent(1L, "click", ts(9), 3L), DebEvent(1L, "click", ts(12), 4L),
      DebEvent(1L, "view", ts(1), 5L),  // separate key: kept
      DebEvent(2L, "click", ts(2), 6L)) // separate key: kept
    val mem = MemoryStream[DebEvent]
    val out = StreamingOps.streamingDebounce(mem.toDS())
    val q = out.writeStream.format("memory")
      .queryName("deb_out").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val kept = spark.table("deb_out").as[DebEvent].collect()
      .map(_.eventId).toSet
    q.stop()
    // batch form of the q186 rule on the same rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("userId"), col("eventType"))
      .orderBy(col("ts"), col("eventId"))
    val batch = rows.toDS().toDF()
      .withColumn("_prev", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("_prev").isNull
        || unix_micros(col("ts")) - col("_prev") > 5000000L)
      .select("eventId").as[Long].collect().toSet
    assert(kept == batch, s"stream $kept vs batch $batch")
    assert(kept == Set(1L, 3L, 5L, 6L), s"keep-set: $kept")
  }

  test("streaming as-of with tolerance equals batch AsofJoin row-for-row " +
      "on the same feed") {
    // VERDICT r12 item 5: q338 (streaming, no tolerance) and q285/q301
    // (batch tolerance/nearest) each gate individually; this pins the
    // TOLERANCE semantics across the two implementations on the SAME real
    // feed — the q338 quote/event split of the sf0.001 events table.
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, d)
    // ~median at-or-before gap on this feed (10 h): roughly half the
    // matched events fall outside it, so the tolerance genuinely bites
    val tol = 36000L
    val quotes = ev.filter(col("event_id") % 5 === 0)
      .groupBy(col("event_type").as("symbol"), col("ts"))
      .agg(min(col("value")).as("value"))
    val evs = ev.filter(col("event_id") % 5 =!= 0)
      .select(col("event_type").as("symbol"), col("ts"),
        col("event_id").as("eventId"))

    val batch = AsofJoin.asof(evs, quotes, Seq("symbol"), "ts", "ts",
        Seq("value"), toleranceSec = Some(tol))
      .select(col("eventId"), col("asof_value")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val evMem = MemoryStream[StreamingOps.AsofEvent]
    val qtMem = MemoryStream[StreamingOps.AsofQuote]
    val out = StreamingOps.streamingAsof(evMem.toDS(), qtMem.toDS(),
      toleranceSec = Some(tol))
    val q = out.writeStream.format("memory")
      .queryName("asof_tol_out").outputMode("append").start()
    qtMem.addData(quotes.as[StreamingOps.AsofQuote].collect().toSeq: _*)
    evMem.addData(evs.as[StreamingOps.AsofEvent].collect().toSeq: _*)
    q.processAllAvailable()
    val got = spark.table("asof_tol_out").collect()
      .map(r => r.getAs[Long]("eventId") ->
        Option(r.getAs[java.lang.Double]("asofValue")).map(_.toDouble))
      .toMap
    q.stop()

    assert(got.size == batch.size, s"${got.size} vs ${batch.size} rows")
    val matched = got.values.count(_.isDefined)
    assert(matched > 0 && matched < got.size,
      s"tolerance must bite: $matched of ${got.size} matched")
    val diffs = got.collect {
      case (id, v) if batch(id) != v => s"$id: stream=$v batch=${batch(id)}"
    }
    assert(diffs.isEmpty, s"row-for-row drift: ${diffs.take(5).mkString("; ")}")
  }

  test("q341 tripwire forced miss names hijack vs banding loss") {
    // VERDICT r13 item 5c: the tripwire's diagnostic must name WHICH
    // recall contract broke. Forced misses: doc 7 surfaced in the
    // evidence stream (all its bands owned by dissimilar earlier docs →
    // ownership hijack); doc 9 never collided on any band (banding loss).
    val e = graft.queries.WindowQueries.recallRegression(
      Seq(7L, 9L), surfaced = Set(7L))
    assert(e.getMessage.contains("MINHASH RECALL REGRESSION"))
    assert(e.getMessage.contains(
      "7[surfaced but failed verify vs its bucket owners: hijack]"))
    assert(e.getMessage.contains(
      "9[never surfaced in any band: banding recall loss]"))
  }
}

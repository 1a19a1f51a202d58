package graft.streaming

import java.sql.Timestamp

import graft.core.Rules
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's time-series operators
  * (SURVEY.md §2.3 "Streaming" row: the batch resample maps 1:1 to an
  * event-time tumbling window; gap detection becomes keyed state).
  *
  * The batch reference is batch-only (src/etl/transform/resample.py is the
  * tumbling-window analog); these entry points run the SAME aggregation
  * map over `readStream` sources with watermarked event time, so a user
  * can point the pipeline at a live feed without rewriting semantics.
  *
  * Scale notes: state is keyed by SYMBOL — partition count follows
  * `spark.sql.shuffle.partitions`, state size is O(symbols), and
  * watermarks bound both lateness and state retention.
  */
object StreamingOps {

  /** Event-time OHLCV resample over a stream: tumbling window of `rule`,
    * watermark `delay` for late data. min_by/max_by give deterministic
    * open/close exactly as in the batch operator.
    */
  def streamingResample(stream: DataFrame, rule: String,
                        delay: String = "1 minute",
                        tsCol: String = "TIMESTAMP",
                        symbolCol: String = "SYMBOL"): DataFrame = {
    val dur = s"${Rules.stepSeconds(rule)} seconds"
    val cols = stream.columns.toSet
    val ts = col(tsCol)
    var aggs = Vector.empty[(String, org.apache.spark.sql.Column)]
    if (cols.contains("OPEN")) aggs :+= "OPEN" ->
      min_by(col("OPEN"), when(col("OPEN").isNotNull, ts))
    if (cols.contains("HIGH")) aggs :+= "HIGH" -> max(col("HIGH"))
    if (cols.contains("LOW")) aggs :+= "LOW" -> min(col("LOW"))
    if (cols.contains("CLOSE")) aggs :+= "CLOSE" ->
      max_by(col("CLOSE"), when(col("CLOSE").isNotNull, ts))
    if (cols.contains("VOLUME")) aggs :+= "VOLUME" ->
      coalesce(sum(col("VOLUME")), lit(0.0))
    stream
      .withWatermark(tsCol, delay)
      .groupBy(col(symbolCol), window(ts, dur).as("bucket"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .select(col(symbolCol) +: col("bucket.start").as(tsCol) +:
        aggs.map { case (n, _) => col(n) }: _*)
  }

  /** Streaming dedup — the O8 keep-first analog for live feeds: duplicate
    * (SYMBOL, TIMESTAMP) ticks within the watermark horizon are dropped
    * (the first arrival wins, which is exactly batch keep-first-in-file-
    * order when arrival order stands in for file order). State = one entry
    * per distinct key inside the horizon, expired BY the watermark —
    * `dropDuplicatesWithinWatermark` bounds state where a bare
    * `dropDuplicates` on a stream would retain every key forever (the
    * unbounded-state trap at 100 TB/day feeds).
    */
  def streamingDedup(stream: DataFrame, delay: String = "1 minute",
                     tsCol: String = "TIMESTAMP",
                     symbolCol: String = "SYMBOL"): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(symbolCol, tsCol)

  final case class Tick(symbol: String, ts: Timestamp, close: Double)
  final case class GapEvent(symbol: String, start: Timestamp, end: Timestamp,
                            missingCount: Long)
  final case class LastSeen(tsMicros: Long)

  /** Stateful streaming gap detection: per symbol, emit a GapEvent whenever
    * consecutive ticks are further apart than the grid step — the streaming
    * analog of O12. State = last stamp per symbol (O(symbols), a few bytes
    * each). A production deployment adds EventTimeTimeout keyed to the
    * watermark to retire symbols that stop ticking; a processing-time
    * timeout keeps the engine scheduling wake-up batches forever, which
    * blocks processAllAvailable-style draining in tests and batch jobs.
    */
  def streamingGapDetect(ticks: Dataset[Tick], rule: String): Dataset[GapEvent] = {
    import ticks.sparkSession.implicits._
    val stepUs = Rules.stepMicros(rule)

    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: String, rows: Iterator[Tick], state: GroupState[LastSeen]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var lastUs = state.getOption.map(_.tsMicros).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[GapEvent]
          for (t <- sorted) {
            val us = t.ts.getTime * 1000L
            if (lastUs != Long.MinValue && us - lastUs > stepUs) {
              out += GapEvent(symbol,
                new Timestamp((lastUs + stepUs) / 1000L),
                new Timestamp((us - stepUs) / 1000L),
                (us - lastUs) / stepUs - 1)
            }
            lastUs = math.max(lastUs, us)
          }
          state.update(LastSeen(lastUs))
          out.result().iterator
      }
  }
}

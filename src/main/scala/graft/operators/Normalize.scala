package graft.operators

import scala.collection.immutable.ListMap

import graft.core.Json
import graft.functions.TzLocalize
import graft.sources.Readers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalization pipeline (reference operators O5–O10:
  * src/etl/transform/normalize.py:239-281): rename → dtype enforcement →
  * datetime/tz normalization → dedup keep-first → sort.
  *
  * The whole transform is one lazy DataFrame graph; the report counters
  * (coercions, NaT counts, duplicate count) are gathered in a SINGLE
  * aggregation job over the pre-dedup frame rather than one eager pass per
  * stage — same numbers, one scan.
  *
  * Scale notes: the only shuffle is the dedup window + final sort, keyed on
  * SYMBOL when present (never a global single-partition window); the rename
  * and required-column logic is driver-side name logic, exactly like the
  * reference's `_build_rename_map`.
  */
object Normalize {

  /** Never-renamed identifier columns (reference: normalize.py:15). */
  val Protected: Set[String] = Set("symbol", "ticker", "instrument", "pair")

  /** Fixed numeric-coercion list (reference: normalize.py:97-101 — BID/ASK
    * intentionally excluded).
    */
  val CoercedCols: Seq[String] =
    Seq("OPEN", "HIGH", "LOW", "CLOSE", "VOLUME", "TICKVOL", "SPREAD")

  val TsCol = "TIMESTAMP"

  /** Verbatim port of `_build_rename_map` (normalize.py:18-56): exact
    * lowercase match, or `variant_` prefix / `_variant` suffix; protected
    * names skipped; targets uppercased. A column matching variants of
    * several targets takes the LAST matching target — Python dict
    * assignment overwrites (and keeps the key's original position), so
    * `columnsMap` must be ordered (ListMap).
    */
  def buildRenameMap(dfCols: Seq[String],
                     columnsMap: ListMap[String, Seq[String]]): ListMap[String, String] = {
    val rename = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((target, variants) <- columnsMap) {
      val targetUp = target.toUpperCase
      val variantsLower = variants.map(_.toLowerCase)
      for (col <- dfCols) {
        val colLower = col.toLowerCase
        if (!Protected.contains(colLower)) {
          if (variantsLower.contains(colLower)) {
            rename(col) = targetUp
          } else {
            val hit = variantsLower.exists(v =>
              v.nonEmpty &&
                (colLower.startsWith(v + "_") || colLower.endsWith("_" + v)))
            if (hit) rename(col) = targetUp
          }
        }
      }
    }
    ListMap(rename.toSeq: _*)
  }

  /** O5: rename + unmatched report. */
  def normalizeColumns(df: DataFrame, columnsMap: ListMap[String, Seq[String]])
      : (DataFrame, ListMap[String, Any]) = {
    val rename = buildRenameMap(
      df.columns.filterNot(_ == Readers.FileOrderCol).toSeq, columnsMap)
    val renamed = df.withColumnsRenamed(rename)
    val targets = columnsMap.keySet.map(_.toUpperCase)
    val unmatched = renamed.columns
      .filterNot(_ == Readers.FileOrderCol)
      .filterNot(c => targets.contains(c.toUpperCase)).toSeq
    (renamed, Json.obj("renamed" -> rename, "unmatched" -> unmatched))
  }

  /** O6 cast step (counts are folded into the single report agg). */
  private def castNumerics(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing required column(s): ${missing.mkString("['", "', '", "']")}")
    val numericCols = CoercedCols.filter(df.columns.contains)
    // try_cast, not cast: pandas to_numeric(errors="coerce") nulls failures,
    // while Spark 4's ANSI-mode cast throws on them.
    df.withColumns(
      numericCols.map(c => c -> col(c).try_cast(DoubleType)).toMap)
  }

  private val DatetimeNames = Set("datetime", "timestamp", "time")

  /** @param df       normalized + deduped + time-sorted frame (O9 order)
    * @param unsorted  deduped frame WITHOUT the final global sort —
    *                  order-insensitive consumers (aggregation, windowed
    *                  repair, resample) should prefer this: a global range
    *                  sort mid-pipeline is pure waste. When `partitionCols`
    *                  was non-empty this frame is additionally guaranteed
    *                  RANGE-partitioned on (keys, TIMESTAMP) and sorted by
    *                  (keys, TIMESTAMP) within partitions — one series may
    *                  span consecutive ordered partitions, so downstream
    *                  per-series scans must run in cross-partition mode
    *                  (FastFill `crossPartition`, Reporting's seeded SMA).
    *
    * The report aggregation is DEFERRED: it first runs when `report` (or
    * `reportWithPostCount`) is accessed, so callers can materialize their
    * own cache of `unsorted` first (which also populates the pre-dedup
    * source cache the agg reads) and compute the report off the critical
    * path. Call `unpersistSource()` only after the report is computed.
    */
  final class Result private[operators] (
      val df: DataFrame,
      val unsorted: DataFrame,
      buildReport: Option[Long] => ListMap[String, Any],
      sourceCache: Option[DataFrame]) {
    def unpersistSource(): Unit = sourceCache.foreach(_.unpersist())
    /** Report with the duplicate count derived from an internal post-dedup
      * count job.
      */
    lazy val report: ListMap[String, Any] = buildReport(None)
    /** Report using a post-dedup row count the caller already has (e.g.
      * from its own cache materialization) — no internal count job.
      */
    def reportWithPostCount(postRows: Long): ListMap[String, Any] =
      buildReport(Some(postRows))
  }

  /** O10: the full pipeline. `computeReport = false` skips the counter agg
    * (the transform stays identical) — used on the hot bench path.
    */
  def apply(input: DataFrame,
            columnsMap: ListMap[String, Seq[String]],
            requiredColumns: Seq[String],
            sourceTz: Option[String],
            targetTz: String = "UTC",
            computeReport: Boolean = true,
            /** series key(s): dedup is keyed (keys, TIMESTAMP) so equal
              * stamps of DIFFERENT series never dedup each other — the
              * reference only ever sees single-series frames, where this is
              * identical to its plain index dedup */
            partitionCols: Seq[String] = Nil,
            /** What to do with tz-NAIVE stamps when no source timezone is
              * configured (O26 `timezone.policy_if_na`, config_model
              * .py:33-45 — parsed but never consumed by the reference;
              * implemented for real here):
              *  - "assume_utc" (default): localize as UTC and flag
              *    `needs_review` (the reference's normalize behavior);
              *  - "mark_needs_review": same localization, the flag is the
              *    point — kept explicit for config intent;
              *  - "require_source": refuse to guess — raise before any
              *    jobs run. */
            policyIfNa: String = "assume_utc"): Result = {

    val ordered =
      if (input.columns.contains(Readers.FileOrderCol)) input
      else input.withColumn(Readers.FileOrderCol, monotonically_increasing_id())

    val (renamed, colReport) = normalizeColumns(ordered, columnsMap)
    val casted = castNumerics(renamed, requiredColumns)

    // O7: locate + parse + localize the datetime column.
    val dtCol = casted.columns
      .find(c => DatetimeNames.contains(c.toLowerCase))
      .getOrElse(throw new IllegalArgumentException(
        "No datetime column found in dataframe."))

    val dtType = casted.schema(dtCol).dataType
    // A string column whose first value carries a UTC offset is tz-aware
    // content (pandas detects this at parse time — normalize.py:198-199).
    val offsetRe = ".*([+-]\\d{2}:?\\d{2}|Z)$"
    val (tzAware, originalTzStr) = dtType match {
      case StringType =>
        val sample = casted.select(col(dtCol)).filter(col(dtCol).isNotNull)
          .limit(1).collect().headOption.map(_.getString(0))
        val aware = sample.exists(_.matches(offsetRe))
        (aware, if (aware) "fixed_offset" else "None")
      case _ => (false, "None")
    }

    val parsed = col(dtCol).try_cast(TimestampType) // parse failures -> null
    val effectiveSourceTz = sourceTz.getOrElse("UTC")
    // Fixed-offset zones (UTC included) have no DST transitions, so the
    // strict localization UDF degenerates to a constant shift — keep the
    // common assume-UTC ingest path fully inside codegen.
    val zoneRules = java.time.ZoneId.of(effectiveSourceTz).getRules
    val localized: Column =
      if (tzAware) parsed // offsets already resolved to instants by the cast
      else if (zoneRules.isFixedOffset) {
        val offUs = zoneRules.getOffset(java.time.Instant.EPOCH)
          .getTotalSeconds * 1000000L
        if (offUs == 0L) parsed
        else timestamp_micros(unix_micros(parsed) - offUs)
      } else {
        // DST-bearing region zone: the native codegen expression (the
        // TzLocalize UDF is the reference form, kept for the spec's
        // semantic cross-check; the expression keeps this projection
        // inside whole-stage codegen)
        graft.plans.GraftExtensions.register(input.sparkSession)
        call_function("tz_localize", parsed, lit(effectiveSourceTz))
      }

    if (!tzAware && sourceTz.isEmpty && policyIfNa == "require_source")
      throw new IllegalArgumentException(
        "timezone.policy_if_na=require_source: timestamps are tz-naive and " +
          "no source timezone is configured")

    val (tzAction, needsReviewBase) =
      if (tzAware) ("already_tzaware", false)
      else if (sourceTz.isDefined) (s"localized_to_${sourceTz.get}", false)
      else ("localized_to_UTC_assumed", true) // assume_utc / mark_needs_review

    val withTs0 = casted
      .withColumn("_ts_parsed", parsed)
      .withColumn(TsCol + "_new", localized)
      .drop(dtCol)
      .withColumnRenamed(TsCol + "_new", TsCol)
    // The report agg and the downstream dedup/sort both consume this frame;
    // cache it so the parse/localize chain executes once, not twice.
    val withTs = if (computeReport) withTs0.cache() else withTs0

    // O8: dedup keep-first in file order (pre-sort — normalize.py:271 vs 275)
    val dedupKeys = partitionCols.filter(withTs.columns.contains)
    val deduped =
      if (dedupKeys.nonEmpty) {
        // Keyed form, RANGE layout: repartitionByRange(keys, stamp) then one
        // partition-local sort. The dedup window partitions by (keys, stamp)
        // ordered by file order — RangePartitioning(keys, stamp) satisfies
        // that window's ClusteredDistribution and the sort matches its
        // required ordering, so Catalyst inserts NO further exchange and NO
        // further sort (asserted by NormalizeSpec's plan test). A row
        // survives iff it is the first file-order occurrence of its stamp
        // (equal stamps — and all-NaT runs — share a window partition, so
        // they dedup to their first row exactly like pandas
        // index.duplicated).
        //
        // Why range and not hash-by-key: hash(keys) puts a symbol's ENTIRE
        // history through one task — the per-symbol straggler/spill that
        // kills a hot symbol at 100 TB (and serialized the whole single-
        // symbol bench pipeline). The range layout splits a series across
        // consecutive ordered partitions; downstream per-series scans
        // (FastFill, SMA) stay narrow via cross-partition boundary seeds.
        val laidOut = withTs
          .repartitionByRange((dedupKeys :+ TsCol).map(col): _*)
          .sortWithinPartitions(
            (dedupKeys :+ TsCol :+ Readers.FileOrderCol).map(col): _*)
        val w = Window.partitionBy((dedupKeys :+ TsCol).map(col): _*)
          .orderBy(col(Readers.FileOrderCol).asc)
        laidOut
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_rn", "_ts_parsed", Readers.FileOrderCol)
      } else {
        // Unkeyed form: partition by the stamp itself — fully parallel, no
        // single-task window (order within a stamp group is all that matters)
        val w = Window.partitionBy(col(TsCol))
          .orderBy(col(Readers.FileOrderCol))
        withTs
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_rn", "_ts_parsed", Readers.FileOrderCol)
      }

    // O9: final sort; pandas sort_index puts NaT last.
    val sorted = deduped.orderBy(col(TsCol).asc_nulls_last)

    // Single report-aggregation job over the pre-dedup frame: numeric
    // coercion counts (total nulls after cast — normalize.py:104-109 counts
    // pre-existing NaNs too), parse-NaT count, post-localize NaT count
    // (ambiguous), and the duplicate count. Deferred into the Result so
    // callers can overlap it with their own jobs; `postRows` (the caller's
    // post-dedup count) saves the internal count job — no countDistinct
    // either way, keeping this a plain one-pass partial/final aggregate.
    val numericCols = CoercedCols.filter(withTs.columns.contains)
    def buildReport(postRows: Option[Long]): ListMap[String, Any] = {
      var preDedupRows = 0L
      var coercedRows = 0L
      var ambiguousNats = 0L
      var coercions = ListMap.empty[String, Long]
      var removedDuplicates = 0L
      if (computeReport) {
        val aggs =
          Seq(count(lit(1)).as("_n"),
            sum(when(col("_ts_parsed").isNull, 1).otherwise(0)).as("_parse_nat"),
            sum(when(col(TsCol).isNull, 1).otherwise(0)).as("_loc_nat")) ++
            numericCols.map(c =>
              sum(when(col(c).isNull, 1).otherwise(0)).as(s"_nc_$c"))
        val row = withTs.agg(aggs.head, aggs.tail: _*).collect()(0)
        preDedupRows = row.getAs[Long]("_n")
        coercedRows = row.getAs[Long]("_parse_nat")
        ambiguousNats = row.getAs[Long]("_loc_nat")
        coercions = ListMap(numericCols.map(c => c -> row.getAs[Long](s"_nc_$c")): _*)
        // removed = preDedup - postDedup (pandas counts all-NaT stamps as
        // duplicates of each other too, which the stamp-keyed dedup mirrors)
        removedDuplicates = preDedupRows - postRows.getOrElse(deduped.count())
      }
      Json.obj(
        "columns" -> colReport,
        "dtypes" -> Json.obj(
          "missing_required" -> Seq.empty[String],
          "numeric_coercions" -> coercions),
        "datetime" -> Json.obj(
          "datetime_col" -> dtCol,
          "coerced_rows" -> coercedRows,
          "tz_action" -> tzAction,
          "original_tz" -> originalTzStr,
          "final_tz" -> targetTz,
          "ambiguous_count" -> ambiguousNats,
          "needs_review" -> (needsReviewBase || ambiguousNats > 0)),
        "duplicates" -> Json.obj("removed_duplicates" -> removedDuplicates))
    }

    new Result(sorted, deduped, buildReport,
      sourceCache = if (computeReport) Some(withTs) else None)
  }
}

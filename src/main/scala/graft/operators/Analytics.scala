package graft.operators

import graft.queries.QueryUtils.fr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, TimestampType}

/** Warehouse-analytics operators the reference's users reach for next once
  * the ETL output lands (profiling, cohorts, funnels, time-weighted prices):
  * each is a single declarative DataFrame shape — one or two keyed shuffles,
  * no windows without partition keys, nothing row-shaped on the driver.
  */
object Analytics {

  /** Column-profile census: for each requested column, null count, distinct
    * count, and min/max rendered to a portable string (doubles via
    * DECIMAL(18,2) so neither engine's float formatter is trusted;
    * timestamps via a fixed `yyyy-MM-dd HH:mm:ss` pattern).
    *
    * One aggregate pass over the relation; the profile itself is N
    * fixed-size rows. `exactDistinct` is the scale switch: exact
    * `countDistinct` is the gate contract (the oracle replays it) but
    * Catalyst's multi-distinct rewrite Expands the scan to ~(N+1)× rows —
    * the plan that dies first at 100 TB. `exactDistinct = false` swaps in
    * `approx_count_distinct` (HLL++, default 5% rsd): one ordinary partial
    * aggregate, no Expand, identical schema.
    */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    val nd: Column => Column =
      if (exactDistinct) countDistinct(_) else approx_count_distinct(_)
    // The Expand rewrite multiplies every input row ~(N+1)× BEFORE the
    // first exchange, so a narrow scan (single-file / single-row-group
    // parquet — parquet can't split below a row group) serializes the
    // whole multiplied pass through one task. When the scan is that much
    // narrower than the session, a round-robin fan-out of the RAW rows
    // restores parallelism for ~a small shuffle (measured 2.5× on the
    // gate). Wide scans — any real warehouse layout — skip it: the
    // exchange would be pure waste there.
    val sc = df.sparkSession.sparkContext
    val in =
      if (exactDistinct && df.rdd.getNumPartitions * 2 < sc.defaultParallelism)
        df.repartition(sc.defaultParallelism)
      else df
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"_pf_nn_$c"),
        nd(col(c)).as(s"_pf_nd_$c"),
        min(col(c)).as(s"_pf_mn_$c"),
        max(col(c)).as(s"_pf_mx_$c"))
    }
    def asStr(c: String, side: String): Column = {
      val v = col(s"_pf_$side$c")
      df.schema(c).dataType match {
        case DoubleType | FloatType => v.cast("decimal(18,2)").cast("string")
        case TimestampType          => date_format(v, "yyyy-MM-dd HH:mm:ss")
        case _                      => v.cast("string")
      }
    }
    val agged = in.agg(aggs.head, aggs.tail: _*)
      .withColumns(cols.flatMap(c => Seq(
        s"_pf_smn_$c" -> asStr(c, "mn_"),
        s"_pf_smx_$c" -> asStr(c, "mx_"))).toMap)
    val stackArgs = cols.map(c =>
      s"'$c', `_pf_nn_$c`, `_pf_nd_$c`, `_pf_smn_$c`, `_pf_smx_$c`")
      .mkString(", ")
    agged.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_v, max_v)",
      "n_rows")
  }

  /** Cohort-retention matrix: cohort = a user's first active day (index from
    * `anchor`), day_offset = days since that cohort day, n_users = distinct
    * users from that cohort active at that offset.
    *
    * Shape: events collapse to distinct (user, day) first — a map-side
    * partial agg shrinks the shuffle to active user-days, not raw events —
    * then one user-keyed agg for the cohort and one user-keyed join back.
    * The final count is `count(*)`, exact because (user, day) is unique and
    * each pair lands in exactly one (cohort_day, day_offset) cell.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      anchor: String): DataFrame = {
    val day = datediff(col(tsCol).cast("date"), to_date(lit(anchor)))
      .cast("long")
    val acts = df.select(col(userCol).as("_cr_user"), day.as("_cr_day"))
      .distinct()
    val cohorts = acts.groupBy("_cr_user")
      .agg(min(col("_cr_day")).as("cohort_day"))
    acts.join(cohorts, "_cr_user")
      .groupBy(col("cohort_day"),
        (col("_cr_day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered-step funnel: n_users reaching step i = users with an event of
    * type steps(i) strictly after their step-(i-1) reach time (min-ts
    * chain). Returns one row per step: (step_idx, step, n_users).
    *
    * Each step is a filter → user-keyed join to the previous reach frame →
    * min agg: k-1 shuffles on the user key for k steps, every task bounded
    * by that user's events. The per-step frames re-derive the chain prefix
    * lazily (bounded: k is small); persist `reached` externally if a
    * many-step funnel warrants it.
    */
  def funnel(df: DataFrame, typeCol: String, userCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached: DataFrame = null
    val perStep = steps.zipWithIndex.map { case (st, i) =>
      val ev = df.filter(col(typeCol) === st)
        .select(col(userCol).as("_fn_user"), col(tsCol).as("_fn_ts"))
      reached =
        if (i == 0) ev.groupBy("_fn_user").agg(min(col("_fn_ts")).as("_fn_ts"))
        else ev
          .join(reached.withColumnRenamed("_fn_ts", "_fn_prev"), "_fn_user")
          .filter(col("_fn_ts") > col("_fn_prev"))
          .groupBy("_fn_user").agg(min(col("_fn_ts")).as("_fn_ts"))
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }
    perStep.reduce(_.unionByName(_))
  }

  /** Time-weighted average price per key: each observation is weighted by
    * the microseconds until the next observation (last one drops out — its
    * holding interval is unknown). A plain mean rides along for contrast.
    *
    * Determinism: the weighted sum is DECIMAL(18,6-value) × BIGINT(µs) —
    * exact and summation-order-independent — so the result is stable across
    * partitionings; only the final division runs in double, under the
    * portable `fr` grid. One keyed window pass + one keyed agg.
    * Precondition: non-null values (else numerator/denominator would skip
    * different rows).
    */
  def twap(df: DataFrame, valueCol: String, tsCol: String,
           partitionCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    df.withColumn("_tw_tu", unix_micros(col(tsCol)))
      .withColumn("_tw_dt", lead(col("_tw_tu"), 1).over(w) - col("_tw_tu"))
      .groupBy(partitionCols.map(col): _*)
      .agg(
        sum(col(valueCol).cast("decimal(18,6)") * col("_tw_dt")).as("_tw_num"),
        sum(col("_tw_dt")).as("_tw_den"),
        sum(col(valueCol).cast("decimal(18,6)")).as("_tw_sv"),
        count(lit(1)).as("n_obs"))
      .select(partitionCols.map(col) ++ Seq(
        fr(col("_tw_num").cast("double") / col("_tw_den").cast("double"), 6)
          .as("twap"),
        fr(col("_tw_sv").cast("double") / col("n_obs"), 6).as("mean_v"),
        col("n_obs")): _*)
  }

  /** Cutler's RSI (simple-moving-average form) per key: 100 − 100/(1 +
    * SMA(gains, n)/SMA(losses, n)) over the trailing n deltas, emitted
    * once the frame is full. Cutler's variant, not Wilder's: the smoothed
    * (EMA) form is recursive — every value depends on the entire history
    * — which neither distributes nor replays; the SMA form is a pure
    * windowed aggregate. Gains/losses accumulate in DECIMAL inside the
    * ROWS frame (engines disagree on float sliding-sum algebra; exact
    * decimals can't), the final ratio is the only double math, and
    * avgLoss = 0 takes the RSI=100 convention.
    */
  def rsi(df: DataFrame, keyCol: String, valueCol: String, tsCol: String,
          tieCol: String, periods: Int = 14): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val frame = w.rowsBetween(-(periods - 1), Window.currentRow)
    val delta = col(valueCol) - lag(col(valueCol), 1).over(w)
    df.withColumn("_delta", delta)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_sg", sum(greatest(col("_delta"), lit(0.0))
        .cast("decimal(18,6)")).over(frame))
      .withColumn("_sl", sum(greatest(-col("_delta"), lit(0.0))
        .cast("decimal(18,6)")).over(frame))
      .filter(col("_rn") > periods) // first delta is null; need n full deltas
      .withColumn("rsi", fr(
        when(col("_sl") === 0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) /
            (lit(1.0) + col("_sg").cast("double") / col("_sl").cast("double"))),
        4))
      .drop("_delta", "_rn", "_sg", "_sl")
  }

  /** Slowly-changing-dimension type-2 history build: collapse an entity's
    * event stream into state runs — one row per maximal run of an
    * unchanged state, with `valid_from` (run start), `valid_to` (next
    * run's start; null while current) and an `is_current` flag. The
    * standard warehouse history table, derived here from a raw change
    * feed by run-length encoding rather than a merge against an existing
    * dimension (snapshotDiff covers the merge direction).
    *
    * Shape: two windows, both partitioned by the entity key — key-parallel
    * with one exchange (the change-marker sort and the post-filter
    * `lead` reuse the same hash partitioning; only the ~runs-sized second
    * sort re-runs). Ordering is (ts, state) so same-timestamp feeds
    * resolve identically on any engine.
    */
  def scd2(df: DataFrame, keyCol: String, stateCol: String,
           tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(stateCol))
    val changes = df
      .select(col(keyCol), col(stateCol), col(tsCol))
      .withColumn("_sc_prev", lag(col(stateCol), 1).over(w))
      // null-safe: the first row's lag is null and must open a run
      .filter(!(col("_sc_prev") <=> col(stateCol)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Trailing event-time rolling aggregate: for every row, the count and
    * exact decimal sum of `valueCol` over the key's rows in
    * `[ts - windowSec, ts]` — both ends inclusive, as SQL RANGE frames
    * are. The per-event trailing-window feature (rate limiting, velocity
    * checks, rolling exposure) that tumbling/hopping aggregations (q94)
    * can't express.
    *
    * Shape: ONE keyed window with a RANGE frame over integer microseconds
    * — Spark evaluates it with a sliding frame cursor per partition, no
    * self-join, no explode; microsecond bounds, not seconds, so sub-second
    * timestamps bucket identically to an engine comparing full-precision
    * intervals. The sum accumulates in DECIMAL so partitioning and frame
    * advance order can't drift a float result.
    */
  def rollingRange(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0L)
    df.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        fr(sum(col(valueCol).cast("decimal(18,6)")).over(w)
          .cast("double"), 4))
  }

  /** Mergeable per-key aggregate state — the incremental-ETL pattern:
    * aggregate each arriving batch once, persist the small state table,
    * and fold new batches in WITHOUT rescanning history. Every component
    * is an algebraic merge (count/sum/min/max; the sum in DECIMAL so
    * merge order can't drift a float), so state merged across any batch
    * split is bit-identical to aggregating all rows at once — the
    * property the q115 oracle checks by doing exactly that.
    */
  def aggState(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("s"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Fold one state table into another (full-outer on the key). */
  def mergeAggStates(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("k").as("k2"), col("n").as("n2"),
      col("s").as("s2"), col("mn").as("mn2"), col("mx").as("mx2"))
    a.join(bb, col("k") === col("k2"), "full_outer")
      .select(
        coalesce(col("k"), col("k2")).as("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0).cast("decimal(18,6)")) +
          coalesce(col("s2"), lit(0).cast("decimal(18,6)"))).as("s"),
        least(coalesce(col("mn"), col("mn2")),
          coalesce(col("mn2"), col("mn"))).as("mn"),
        greatest(coalesce(col("mx"), col("mx2")),
          coalesce(col("mx2"), col("mx"))).as("mx"))
  }

  /** Apply a CDC changelog to a keyed snapshot: per key, the LATEST
    * change (by `(ts, op, value)` — a total order, so same-timestamp
    * feeds resolve identically on any engine) wins; a final 'D' deletes
    * the key, anything else upserts its value; untouched snapshot keys
    * pass through. One changes-side keyed window + one full-outer join —
    * the merge-on-read shape of every open-table format's MERGE.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCol: String, valueCol: String, tsCol: String,
                     opCol: String): DataFrame = {
    val latest = changes
      .select(col(keyCol).cast("long").as("_ck"), col(valueCol).as("_cv"),
        col(tsCol).as("_cts"), col(opCol).as("_cop"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_ck"))
          .orderBy(col("_cts").desc, col("_cop").desc, col("_cv").desc)))
      .filter(col("_rn") === 1)
    snapshot
      .select(col(keyCol).cast("long").as("_sk"), col(valueCol).as("_sv"))
      .join(latest, col("_sk") === col("_ck"), "full_outer")
      .filter(col("_cop").isNull || col("_cop") =!= "D")
      .select(coalesce(col("_sk"), col("_ck")).as(keyCol),
        coalesce(col("_cv"), col("_sv")).as(valueCol))
  }
}

package graft.queries

import graft.core.Tables
import graft.queries.QueryUtils.{decSum, fr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries Q1–Q17 + Q24–Q27 (SURVEY.md §2.4): scans, scalar functions,
  * joins, aggregations, set ops. Each query is declared with the DataFrame
  * API — Catalyst handles pushdown, pruning, join selection; small dimension
  * tables are explicitly `broadcast()`-hinted where 100 TB fact-side scans
  * would otherwise shuffle.
  *
  * Determinism policy (oracle hash-parity with DuckDB):
  *  - every query ends in a total ORDER BY with a unique key suffix;
  *  - floating aggregates wrapped in round(_, n);
  *  - integer-ish derived columns aligned to BIGINT on both engines;
  *  - NULLS FIRST explicit wherever a nullable sort key occurs (Spark
  *    defaults nulls-first, DuckDB nulls-last).
  */
object RelationalQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
        // order by every projected column so LIMIT-boundary ties are
        // value-identical on both engines.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(100)
    },

    "q02_case_cast" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice")).as("price_int"),
          when(col("o_orderstatus") === "F", "final")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status"))
        .orderBy("o_orderkey")
        .limit(100)
    },

    "q03_string_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_name").like("%1%"))
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("un"),
          lower(col("c_mktsegment")).as("lm"),
          length(col("c_name")).cast("long").as("ln"),
          substring(col("c_name"), 1, 8).as("s8"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("cc"),
          regexp_replace(col("c_name"), "#", "@").as("rp"))
        .orderBy("c_custkey")
    },

    "q04_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mstart"))
        .orderBy("o_orderkey")
        .limit(200)
    },

    "q05_math_funcs" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          fr(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")), 4).as("chg"),
          fr(abs(col("l_discount") - 0.05), 4).as("ad"),
          floor(col("l_quantity")).as("fq"),
          ceil(col("l_quantity")).as("cq"))
        .orderBy("l_orderkey", "l_linenumber", "chg", "ad", "fq", "cq")
        .limit(200)
    },

    "q06_inner_join" -> { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
        .orderBy("o_orderkey")
        .limit(200)
    },

    // TPC-H Q5 shape. nation/region are tiny -> broadcast; customer joins
    // stay shuffle-side (AQE picks broadcast when it fits).
    "q07_multiway_join_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // revenue in exact long cents (r17, q185's device): price and
        // discount are exactly 2-decimal, so price_c·(100−disc_c) is the
        // revenue scaled by 10⁴ in codegen int64 — no per-row BigDecimal
        // multiply — and the single exact decimal division per group
        // recovers the oracle's rational bit for bit before the round.
        .agg(round(sum((floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
              .cast("long")
            * (lit(100L) - floor(col("l_discount") * lit(100.0) + lit(0.5))
              .cast("long"))).cast("decimal(38,0)"))
            / lit(10000), 2)
          .cast("double").as("revenue"))
        .orderBy("n_name")
    },

    "q08_left_join_count" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },

    "q09_semi_join" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    "q10_anti_join" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    // Range/theta self-join, bucketed: joining on user_id alone makes pair
    // enumeration quadratic in events-per-user — a task-killer under a
    // power-law user at 100×. The 5-minute window is covered by exactly two
    // 5-minute time buckets, so the left side explodes to (bucket, bucket+1)
    // and the join key becomes (user_id, bucket): candidates per row are
    // bounded by two buckets regardless of user skew, and the range
    // predicate then filters exactly. Each right row has ONE bucket, so no
    // pair can match twice.
    "q11_range_self_join" -> { (s, d) =>
      val bucketSec = 300L
      val e1 = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id").as("a"), col("user_id").as("u1"),
          col("ts").as("ts1"))
        .withColumn("_bkt",
          explode(array(floor(unix_seconds(col("ts1")) / bucketSec),
            floor(unix_seconds(col("ts1")) / bucketSec) + 1)))
      val e2 = Tables.events(s, d)
        .select(col("event_id").as("b"), col("user_id").as("u2"),
          col("ts").as("ts2"))
        .withColumn("_bkt2", floor(unix_seconds(col("ts2")) / bucketSec))
      e1.join(e2,
          col("u1") === col("u2") && col("_bkt") === col("_bkt2") &&
            col("ts2") > col("ts1") &&
            col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .select("a", "b")
        .orderBy("a", "b")
        .limit(500)
    },

    // As-of join (latest order at-or-before each event, per user),
    // decorrelated into join + re-aggregate. Scale path: per-user sort-merge
    // as-of (see operators.AsofJoin) when the at-or-before side is large.
    "q12_asof_join" -> { (s, d) =>
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"))
      e.join(o, col("user_id") === col("o_custkey") &&
            col("o_orderdate") <= col("ts"), "left")
        .groupBy(col("event_id"))
        .agg(max(col("o_orderdate")).cast("timestamp_ntz").as("asof_order"))
        .orderBy("event_id")
        .limit(500)
    },

    // TPC-H Q1 shape — partial (map-side) aggregation then final merge,
    // the direct analog of the reference's single-pass resample agg.
    "q13_multi_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          round(decSum(col("l_quantity")), 2).cast("double").as("sq"),
          fr(decSum(col("l_extendedprice")).cast("double") / count(lit(1)), 4)
            .as("ap"),
          min(col("l_shipdate")).cast("timestamp_ntz").as("d0"),
          max(col("l_shipdate")).cast("timestamp_ntz").as("d1"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q14_count_distinct" -> { (s, d) =>
      Tables.orders(s, d)
        .agg(
          countDistinct(col("o_custkey")).as("dc"),
          countDistinct(col("o_orderpriority")).as("dp"))
    },

    "q15_rollup" -> { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"))
        .agg(grouping(col("n_name")).cast("long").as("g"),
          count(lit(1)).as("n"))
        .orderBy(col("g"), col("n_name").asc_nulls_first)
    },

    // Explicit GROUPING SETS through the spark.sql entry point — the one
    // API surface the DataFrame-declared queries don't touch (rollup/cube
    // are q15/q16; arbitrary set lists only exist in SQL). The temp views
    // feed the same Catalyst plan as the DataFrame API would.
    "q92_grouping_sets" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT c_mktsegment, n_name,
          CAST(grouping(c_mktsegment) AS BIGINT) AS g1,
          CAST(grouping(n_name) AS BIGINT) AS g2,
          count(*) AS n
        FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment),
          (n_name), ())
        ORDER BY g1, g2, c_mktsegment NULLS FIRST, n_name NULLS FIRST""")
    },

    // HLL++ approximate distinct beside the exact count, gated q83-style
    // ("measure, don't guess"): the output asserts the estimate's relative
    // error, so a broken sketch fails the hash compare even though the
    // oracle can't replay the estimate itself.
    "q93_approx_distinct" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("_est"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("_est") - col("n_exact")).cast("double")
            / col("n_exact") <= 0.05).as("within_5pct"))
        .orderBy("event_type")
    },

    // Statistical-moment aggregates (the surface q13's sums don't touch):
    // sample stddev/variance and Pearson correlation of value against
    // event time. Only standardized-definition aggregates — skewness/
    // kurtosis differ between engines (population vs bias-corrected
    // sample) and are deliberately excluded. The time axis is centered
    // (epoch of 2024-01-01) so the correlation's co-moment never
    // cancels catastrophically against a ~1.7e9 offset.
    "q97_stat_moments" -> { (s, d) =>
      val t0 = lit("2024-01-01").cast("timestamp").cast("double")
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          fr(stddev_samp(col("value")), 4).as("sd"),
          fr(var_samp(col("value")), 4).as("vr"),
          fr(corr(col("value"), col("ts").cast("double") - t0), 6).as("cr"))
        .orderBy("event_type")
    },

    "q16_cube" -> { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          grouping(col("c_mktsegment")).cast("long").as("g1"),
          grouping(col("o_orderpriority")).cast("long").as("g2"),
          count(lit(1)).as("n"))
        .orderBy(col("g1"), col("g2"),
          col("c_mktsegment").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Exact median — Spark 3.4+ built-in `median` (exact, not approx;
    // matches reporting.py:74 close_median semantics).
    "q17_median" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          fr(median(col("c_acctbal")), 4).as("med"),
          fr(decSum(col("c_acctbal"), 18, 2).cast("double") / count(lit(1)), 4)
            .as("avgb"))
        .orderBy("c_mktsegment")
    },

    "q24_global_topk" -> { (s, d) =>
      // TakeOrderedAndProject physical op: per-partition top-k then merge,
      // no global sort shuffle.
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    "q25_union" -> { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("x"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("x"))
      a.union(b).distinct().orderBy("x")
    },

    "q26_intersect" -> { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("x"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("x"))
      a.intersect(b).orderBy("x")
    },

    "q27_except" -> { (s, d) =>
      val a = Tables.customer(s, d).select(col("c_custkey").as("x"))
      val b = Tables.orders(s, d).select(col("o_custkey").as("x"))
      a.except(b).orderBy("x")
    },

    // Co-located join over bucketed tables (Exporter.writeBucketed): both
    // sides bucketed+sorted on the join key, so the join plan has NO
    // exchange — the physical property is asserted by PlanSpec; this gate
    // row proves the VALUES survive the bucketed layout (the oracle joins
    // the plain parquet). Integer-floored sum keeps the aggregate
    // order-independent across engines.
    "q48_bucketed_join" -> { (s, d) =>
      import graft.operators.Exporter
      Exporter.writeBucketed(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "graft_bkt_orders", Seq("o_custkey"), 8, sortCols = Seq("o_custkey"))
      Exporter.writeBucketed(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment")),
        "graft_bkt_customer", Seq("c_custkey"), 8, sortCols = Seq("c_custkey"))
      s.table("graft_bkt_orders")
        .join(s.table("graft_bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice")).cast("long")).as("sum_price_int"))
        .orderBy("c_mktsegment")
    },

    // Column-profile census (Analytics.profile): one agg pass, N fixed-size
    // rows out. Doubles/timestamps render through portable formatters so
    // neither engine's native float/ts printer is trusted.
    "q98_column_profile" -> { (s, d) =>
      graft.operators.Analytics.profile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
        .orderBy("col_name")
    },

    // Cohort retention (Analytics.cohortRetention): distinct user-days ->
    // user-keyed cohort agg -> offset matrix. Day indices are integers from
    // a fixed anchor so no week-start convention can diverge.
    "q99_cohort_retention" -> { (s, d) =>
      graft.operators.Analytics.cohortRetention(
        Tables.events(s, d), "user_id", "ts", "2024-01-01")
        .orderBy("cohort_day", "day_offset")
    },

    // Ordered-step funnel (Analytics.funnel): signup -> click -> purchase
    // min-ts chains, one row per step. The oracle compares timestamps at
    // the same µs truncation Spark reads.
    "q100_event_funnel" -> { (s, d) =>
      graft.operators.Analytics.funnel(Tables.events(s, d),
        "event_type", "user_id", "ts", Seq("signup", "click", "purchase"))
        .orderBy("step_idx")
    },

    // Linear-regression aggregate family (regr_slope/intercept/r2/count)
    // of value against event time in DAYS from a fixed anchor — the
    // centering keeps the co-moments away from catastrophic cancellation
    // (q97's corr lesson) and day units keep the slope magnitude sane for
    // the 1e-6 rounding grid.
    "q103_regr_family" -> { (s, d) =>
      val t0 = lit("2024-01-01").cast("timestamp")
      Tables.events(s, d)
        .withColumn("_x",
          (unix_micros(col("ts")) - unix_micros(t0)).cast("double")
            / lit(86400.0e6))
        .groupBy(col("event_type"))
        .agg(
          expr("regr_count(value, _x)").cast("long").as("n"),
          fr(expr("regr_slope(value, _x)"), 6).as("slope"),
          fr(expr("regr_intercept(value, _x)"), 6).as("icept"),
          fr(expr("regr_r2(value, _x)"), 6).as("r2"))
        .orderBy("event_type")
    },

    // Correlated scalar subqueries ("orders above 1.5× their customer's
    // average") through the spark.sql entry, exercising Catalyst's
    // de-correlation rewrite twice. The comparison is pure DECIMAL/BIGINT
    // cross-multiplication — price·2·count > 3·sum — so no engine ever
    // divides: an avg in double would put boundary rows at the mercy of
    // summation order.
    "q109_correlated_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderkey, o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders_v o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
            (SELECT count(*) FROM orders_v o2
             WHERE o2.o_custkey = o.o_custkey)
          > 3 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
                 FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },

    // Approx-percentile accuracy eval, gated q93-style: the exact
    // interpolated median rides beside the sketch estimate and the 5%
    // tolerance boolean is computed Spark-side — the oracle replays the
    // exact value and pins TRUE, so sketch drift fails the hash compare
    // even though no engine replays the sketch itself.
    "q110_approx_percentile" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5)").as("_p50"),
          expr("approx_percentile(value, 0.5, 10000)").as("_ap"))
        .select(col("event_type"), col("n"), fr(col("_p50"), 4).as("p50"),
          (abs(col("_ap") - col("_p50")) / col("_p50") <= 0.05)
            .as("within_5pct"))
        .orderBy("event_type")
    },

    // IGNORE NULLS window family (lag / first_value / running
    // last_value) over a deterministic null mask — the gap-bridging
    // forms q20's plain lag/lead don't touch. Running last_value with
    // ignoreNulls IS forward-fill; the (ts, event_id) ordering makes
    // same-timestamp rows resolve identically on any engine.
    "q111_ignore_nulls_window" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .filter(col("user_id") % 199 === 0)
        .withColumn("v_masked",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
        .select(col("user_id"), col("event_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("v_masked"),
          lag(col("v_masked"), 1, null, ignoreNulls = true).over(w)
            .as("prev_v"),
          first(col("v_masked"), ignoreNulls = true).over(wRun).as("first_v"),
          last(col("v_masked"), ignoreNulls = true).over(wRun).as("ffill_v"))
        .orderBy("user_id", "ts", "event_id")
    },

    // Tolerance-bounded as-of join (pandas merge_asof `tolerance`
    // parity): for each click, the user's latest purchase at-or-before
    // it — but only within ONE HOUR; a staler purchase attaches as null
    // instead of silently matching. Runs through the AsofJoin merge-scan
    // operator (the 100 TB path: one combined shuffle, single-row state,
    // the right row's event time rides inside the carried struct so the
    // window check is free); the oracle replays the window with a
    // correlated range-bounded max.
    "q285_asof_tolerance" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("buy_ts"))
      graft.operators.AsofJoin.asof(clicks, buys, Seq("user_id"),
          leftTs = "ts", rightTs = "buy_ts",
          pickCols = Seq("buy_ts"),
          toleranceSec = Some(3600L))
        .select(col("event_id"),
          col("asof_buy_ts").cast("timestamp_ntz").as("buy_within_1h"))
        .orderBy("event_id")
        .limit(500)
    },

    // Nearest-direction as-of (pandas merge_asof direction='nearest'):
    // the purchase CLOSEST in time to each click — before or after —
    // within ±1 hour, ties to the earlier row (pandas' backward
    // preference). Runs through AsofJoin.asofNearest: the two
    // directional merge-scans joined back on event_id, chooser a plain
    // µs-exact projection; the oracle replays it with a correlated
    // min-|diff| pick under the same tie order.
    "q301_asof_nearest" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("buy_ts"))
      graft.operators.AsofJoin.asofNearest(clicks, buys, Seq("user_id"),
          leftIdCol = "event_id", leftTs = "ts", rightTs = "buy_ts",
          pickCols = Seq("buy_ts"), toleranceSec = Some(3600L))
        .select(col("event_id"),
          col("asof_buy_ts").cast("timestamp_ntz").as("nearest_buy_1h"))
        .orderBy("event_id")
        .limit(500)
    }
  )

  val sql: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 100""".stripMargin,

    "q02_case_cast" ->
      """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        |CASE WHEN o_orderstatus = 'F' THEN 'final'
        |     WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END AS status
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "q03_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS un, lower(c_mktsegment) AS lm,
        |CAST(length(c_name) AS BIGINT) AS ln, substr(c_name, 1, 8) AS s8,
        |concat(c_mktsegment, '-', c_name) AS cc, replace(c_name, '#', '@') AS rp
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,

    "q04_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        |CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(day(o_orderdate) AS BIGINT) AS d,
        |CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin,

    "q05_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0 + 0.5) / 10000.0 AS chg,
        |floor(abs(l_discount - 0.05) * 10000.0 + 0.5) / 10000.0 AS ad,
        |CAST(floor(l_quantity) AS BIGINT) AS fq,
        |CAST(ceil(l_quantity) AS BIGINT) AS cq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, chg, ad, fq, cq LIMIT 200""".stripMargin,

    "q06_inner_join" ->
      """SELECT o.o_orderkey, c.c_name FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey LIMIT 200""".stripMargin,

    "q07_multiway_join_agg" ->
      """SELECT n.n_name,
        |CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
        |               * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,

    "q08_left_join_count" ->
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "q10_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q11_range_self_join" ->
      """SELECT e1.event_id AS a, e2.event_id AS b
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e2.ts > e1.ts
        | AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        |WHERE e1.event_type = 'click'
        |ORDER BY a, b LIMIT 500""".stripMargin,

    "q12_asof_join" ->
      """SELECT e.event_id,
        |       (SELECT max(o.o_orderdate) FROM orders o
        |        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_order
        |FROM events e ORDER BY e.event_id LIMIT 500""".stripMargin,

    "q13_multi_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sq,
        |floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*) * 10000.0 + 0.5) / 10000.0 AS ap,
        |min(l_shipdate) AS d0, max(l_shipdate) AS d1
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q14_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS dc,
        |count(DISTINCT o_orderpriority) AS dp FROM orders""".stripMargin,

    "q15_rollup" ->
      """SELECT n.n_name, CAST(grouping(n.n_name) AS BIGINT) AS g, count(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY ROLLUP(n.n_name) ORDER BY g, n_name NULLS FIRST""".stripMargin,

    "q92_grouping_sets" ->
      """SELECT c_mktsegment, n_name,
        |  CAST(grouping(c_mktsegment) AS BIGINT) AS g1,
        |  CAST(grouping(n_name) AS BIGINT) AS g2,
        |  count(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment),
        |  (n_name), ())
        |ORDER BY g1, g2, c_mktsegment NULLS FIRST, n_name NULLS FIRST"""
        .stripMargin,

    // TRUE is the contract: a sketch estimate drifting past 5% relative
    // error flips the boolean and fails the hash compare
    "q93_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // µs-cast before epoch so both engines measure the same timestamps
    "q97_stat_moments" ->
      """SELECT event_type, count(*) AS n,
        |  floor(stddev_samp(value) * 10000.0 + 0.5) / 10000.0 AS sd,
        |  floor(var_samp(value) * 10000.0 + 0.5) / 10000.0 AS vr,
        |  floor(corr(value, epoch(CAST(ts AS TIMESTAMP))
        |      - epoch(TIMESTAMP '2024-01-01')) * 1000000.0 + 0.5)
        |    / 1000000.0 AS cr
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_cube" ->
      """SELECT c_mktsegment, o_orderpriority,
        |CAST(grouping(c_mktsegment) AS BIGINT) AS g1,
        |CAST(grouping(o_orderpriority) AS BIGINT) AS g2, count(*) AS n
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderpriority)
        |ORDER BY g1, g2, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q17_median" ->
      """SELECT c_mktsegment,
        |floor(median(c_acctbal) * 10000.0 + 0.5) / 10000.0 AS med,
        |floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) * 10000.0 + 0.5) / 10000.0 AS avgb
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q24_global_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q25_union" ->
      """SELECT x FROM (SELECT c_custkey AS x FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000) ORDER BY x""".stripMargin,

    "q26_intersect" ->
      """SELECT x FROM (SELECT c_custkey AS x FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 200000) ORDER BY x""".stripMargin,

    "q27_except" ->
      """SELECT x FROM (SELECT c_custkey AS x FROM customer
        |EXCEPT SELECT o_custkey FROM orders) ORDER BY x""".stripMargin,

    // the oracle joins the plain parquet — bucketing must not change values
    "q48_bucketed_join" ->
      """SELECT c.c_mktsegment,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_int
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    // min/max render through CAST/strftime so both engines print the same
    // strings; doubles go via DECIMAL(18,2), timestamps via a fixed pattern
    "q98_column_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name, count(*) - count(o_orderkey) AS n_null,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_v,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_v, count(*) AS n_rows
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey), CAST(min(o_custkey) AS VARCHAR),
        |    CAST(max(o_custkey) AS VARCHAR), count(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
        |    count(DISTINCT o_orderstatus), min(o_orderstatus),
        |    max(o_orderstatus), count(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*) - count(o_totalprice),
        |    count(DISTINCT o_totalprice),
        |    CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
        |    CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
        |    count(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*) - count(o_orderdate),
        |    count(DISTINCT o_orderdate),
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |    count(*) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
        |    count(DISTINCT o_orderpriority), min(o_orderpriority),
        |    max(o_orderpriority), count(*) FROM orders
        |) ORDER BY col_name""".stripMargin,

    "q99_cohort_retention" ->
      """WITH acts AS (SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |coh AS (SELECT u, min(d) AS cohort_day FROM acts GROUP BY u)
        |SELECT cohort_day, d - cohort_day AS day_offset, count(*) AS n_users
        |FROM acts JOIN coh USING (u)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,

    // timestamps compared at the same µs truncation Spark reads (ns parquet)
    "q100_event_funnel" ->
      """WITH ev AS (SELECT user_id AS u, event_type,
        |    CAST(ts AS TIMESTAMP) AS t FROM events),
        |s1 AS (SELECT u, min(t) AS t FROM ev
        |  WHERE event_type = 'signup' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.t) AS t FROM ev e
        |  JOIN s1 ON e.u = s1.u AND e.t > s1.t
        |  WHERE e.event_type = 'click' GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.t) AS t FROM ev e
        |  JOIN s2 ON e.u = s2.u AND e.t > s2.t
        |  WHERE e.event_type = 'purchase' GROUP BY e.u)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3)
        |ORDER BY step_idx""".stripMargin,

    "q103_regr_family" ->
      """SELECT event_type,
        |  CAST(regr_count(value, x) AS BIGINT) AS n,
        |  floor(regr_slope(value, x) * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor(regr_intercept(value, x) * 1000000.0 + 0.5) / 1000000.0 AS icept,
        |  floor(regr_r2(value, x) * 1000000.0 + 0.5) / 1000000.0 AS r2
        |FROM (SELECT event_type, value,
        |    (epoch_us(CAST(ts AS TIMESTAMP))
        |     - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000.0 AS x
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q109_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
        |    (SELECT count(*) FROM orders o2
        |     WHERE o2.o_custkey = o.o_custkey)
        |  > 3 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |         FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    // TRUE is the contract (q93 pattern): sketch drift past 5% relative
    // error flips the boolean and fails the hash compare
    "q110_approx_percentile" ->
      """SELECT event_type, count(*) AS n,
        |  floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q111_ignore_nulls_window" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, v_masked,
        |  lag(v_masked IGNORE NULLS) OVER w AS prev_v,
        |  first_value(v_masked IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
        |  last_value(v_masked IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_v
        |FROM (SELECT user_id, event_id, ts,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v_masked
        |  FROM events WHERE user_id % 199 = 0)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "q285_asof_tolerance" ->
      """SELECT e.event_id,
        |  (SELECT max(p.ts) FROM events p
        |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |     AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR)
        |    AS buy_within_1h
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id LIMIT 500""".stripMargin,

    "q301_asof_nearest" ->
      """SELECT e.event_id,
        |  (SELECT p.ts FROM events p
        |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |     AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 3600000000
        |   ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)), p.ts
        |   LIMIT 1) AS nearest_buy_1h
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id LIMIT 500""".stripMargin
  )
}

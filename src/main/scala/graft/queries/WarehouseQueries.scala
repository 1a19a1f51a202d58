package graft.queries

import graft.core.Tables
import graft.queries.QueryUtils.{decSum, fr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse / product-analytics gate queries (round 9 widening): the
  * marketing-attribution, customer-segmentation, frontier-analysis and
  * risk-metric shapes a warehouse team runs daily, each with a DuckDB
  * oracle under the house determinism rules (QueryUtils: DECIMAL sums,
  * integer-µs time math, fr-gridded divisions, (ts, event_id) total
  * orders).
  */
object WarehouseQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Last-touch attribution: each purchase is credited to the user's most
    // recent preceding marketing touch (click/view) — the IGNORE NULLS
    // carry that forward-fill (q111) and sessionize share, pointed at the
    // conversion question. The window is keyed by user (scales), delays
    // are exact integer microseconds summed in DECIMAL, and the only
    // double math is the final fr-gridded division.
    "q127_last_touch_attribution" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type").isin("click", "view"),
        col("event_type"))
      val touchTs = when(col("event_type").isin("click", "view"), col("ts"))
      Tables.events(s, d)
        .withColumn("_touch", last(touch, ignoreNulls = true).over(w))
        .withColumn("_touch_ts", last(touchTs, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("_delay_us",
          unix_micros(col("ts")) - unix_micros(col("_touch_ts")))
        .groupBy(coalesce(col("_touch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("conversions"),
          count(col("_touch_ts")).as("n_attributed"),
          sum(col("_delay_us").cast("decimal(20,0)")).as("_sum_us"))
        .select(col("channel"), col("conversions"), col("n_attributed"),
          when(col("n_attributed") > 0,
            fr(col("_sum_us").cast("double") / col("n_attributed")
              / lit(1000000.0), 4)).as("avg_delay_sec"))
        .orderBy("channel")
    },

    // Threshold-based RFM segmentation over orders: recency from a FIXED
    // anchor date (the q99 lesson — no engine-specific "today"), frequency
    // and DECIMAL monetary per customer, each scored 1-5 against fixed
    // business thresholds. Thresholds instead of ntile() by design: a
    // global ntile is a single-task keyless window over every customer,
    // while threshold scoring is pure scan math that parallelizes
    // perfectly at 100 TB (quantile-derived thresholds would come from the
    // q86 percentile census, computed once and broadcast as constants).
    "q128_rfm_segments" -> { (s, d) =>
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("_last"),
          count(lit(1)).as("_freq"),
          decSum(col("o_totalprice")).as("_mon"))
        .withColumn("_rec_days",
          datediff(lit("2001-12-31").cast("date"), col("_last").cast("date")))
      def score(c: Column, t5: Column, t4: Column, t3: Column,
                t2: Column): Column =
        when(t5, 5).when(t4, 4).when(t3, 3).when(t2, 2).otherwise(1)
      perCust
        .withColumn("r_score", score(col("_rec_days"),
          col("_rec_days") <= 180, col("_rec_days") <= 365,
          col("_rec_days") <= 730, col("_rec_days") <= 1460))
        .withColumn("f_score", score(col("_freq"),
          col("_freq") >= 15, col("_freq") >= 10,
          col("_freq") >= 6, col("_freq") >= 3))
        .withColumn("m_score", score(col("_mon"),
          col("_mon") >= 4000000, col("_mon") >= 3000000,
          col("_mon") >= 2000000, col("_mon") >= 1000000))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"),
          fr(sum(col("_mon")).cast("double"), 2).as("total_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    },

    // Pareto frontier (skyline) of per-part (total quantity ↑, total
    // price ↓): parts no other part beats on both axes. The naive form is
    // an all-pairs dominance test; the scale-safe form used here is the
    // sort-based skyline decomposed exactly like q62's prefix sums — the
    // distinct (price, qty) census buckets by price range, a KEYED window
    // computes the within-bucket running max-qty, a 64-row bucket
    // aggregate + bounded prefix window carries the cross-bucket max, and
    // a point survives iff its qty strictly exceeds every lower-priced
    // point's. No cartesian join anywhere (PlanSpec-pinned); the oracle
    // replays dominance declaratively with NOT EXISTS over the same
    // census, which is algorithm-independent.
    "q129_pareto_frontier" -> { (s, d) =>
      val pts = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(decSum(col("l_quantity")).as("qty"),
          decSum(col("l_extendedprice")).as("price"))
      val census = pts.select(col("price"), col("qty")).distinct()
      val B = 64
      val rng = census.agg(min(col("price").cast("double")).as("_lo"),
        max(col("price").cast("double")).as("_hi"))
      // bucket boundaries only partition work — any monotone-in-price
      // assignment yields the same frontier, so double math is fine here
      val bucketed = census.crossJoin(broadcast(rng))
        .withColumn("_b", least(lit(B - 1), greatest(lit(0),
          floor((col("price").cast("double") - col("_lo"))
            / greatest(col("_hi") - col("_lo"), lit(0.01)) * B))))
      val wIn = Window.partitionBy(col("_b"))
        .orderBy(col("price").asc, col("qty").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val neg = lit(-1).cast("decimal(18,4)")
      val perB = bucketed.groupBy(col("_b")).agg(max(col("qty")).as("_bmax"))
        .withColumn("_prefix", max(col("_bmax")).over(
          Window.orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("_b"), col("_prefix"))
      val frontier = bucketed
        .withColumn("_inmax", max(col("qty")).over(wIn))
        .join(perB, Seq("_b"))
        .filter(col("qty") > greatest(coalesce(col("_inmax"), neg),
          coalesce(col("_prefix"), neg)))
        .select(col("price"), col("qty"))
      pts.join(frontier, Seq("price", "qty"))
        .select(col("l_partkey"), fr(col("price").cast("double"), 2).as("price"),
          fr(col("qty").cast("double"), 2).as("qty"))
        .orderBy("price", "l_partkey")
    },

    // Maximum drawdown per user value stream: running peak via a keyed
    // cummax window (max is summation-order-free, so the window is
    // replayable on any engine), drawdown = (peak − value)/peak on
    // identical doubles, per-user max then fr-gridded once. The risk
    // metric every quant pipeline computes; one keyed window + one
    // aggregate, no self-join.
    "q130_max_drawdown" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .filter(col("value") > 0)
        .withColumn("_peak", max(col("value")).over(w))
        .withColumn("_dd", (col("_peak") - col("value")) / col("_peak"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_obs"),
          max(col("value")).as("peak_value"),
          fr(max(col("_dd")), 6).as("max_drawdown"))
        .orderBy("user_id")
    }
  )

  val sql: Map[String, String] = Map(

    "q127_last_touch_attribution" ->
      """WITH t AS (SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN event_type IN ('click','view')
        |        THEN event_type END IGNORE NULLS) OVER w AS touch,
        |    last_value(CASE WHEN event_type IN ('click','view')
        |        THEN ts END IGNORE NULLS) OVER w AS touch_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (SELECT coalesce(touch, 'direct') AS channel,
        |    count(*) AS conversions,
        |    count(touch_ts) AS n_attributed,
        |    sum(epoch_us(ts) - epoch_us(touch_ts)) AS sum_us
        |  FROM t WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT channel, conversions, n_attributed,
        |  CASE WHEN n_attributed > 0 THEN
        |    floor(CAST(sum_us AS DOUBLE) / n_attributed / 1000000.0
        |      * 10000.0 + 0.5) / 10000.0 END AS avg_delay_sec
        |FROM g ORDER BY channel""".stripMargin,

    "q128_rfm_segments" ->
      """WITH pc AS (SELECT o_custkey,
        |    date_diff('day', CAST(max(o_orderdate) AS DATE),
        |      DATE '2001-12-31') AS rec_days,
        |    count(*) AS freq,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS mon
        |  FROM orders GROUP BY o_custkey),
        |sc AS (SELECT
        |    CASE WHEN rec_days <= 180 THEN 5 WHEN rec_days <= 365 THEN 4
        |      WHEN rec_days <= 730 THEN 3 WHEN rec_days <= 1460 THEN 2
        |      ELSE 1 END AS r_score,
        |    CASE WHEN freq >= 15 THEN 5 WHEN freq >= 10 THEN 4
        |      WHEN freq >= 6 THEN 3 WHEN freq >= 3 THEN 2
        |      ELSE 1 END AS f_score,
        |    CASE WHEN mon >= 4000000 THEN 5 WHEN mon >= 3000000 THEN 4
        |      WHEN mon >= 2000000 THEN 3 WHEN mon >= 1000000 THEN 2
        |      ELSE 1 END AS m_score,
        |    mon FROM pc)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  floor(CAST(sum(mon) AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS total_monetary
        |FROM sc GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin,

    "q129_pareto_frontier" ->
      """WITH pts AS (SELECT l_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS price
        |  FROM lineitem GROUP BY l_partkey),
        |census AS (SELECT DISTINCT price, qty FROM pts),
        |sky AS (SELECT price, qty FROM census p WHERE NOT EXISTS (
        |  SELECT 1 FROM census s
        |  WHERE s.price <= p.price AND s.qty >= p.qty
        |    AND (s.price < p.price OR s.qty > p.qty)))
        |SELECT t.l_partkey,
        |  floor(CAST(t.price AS DOUBLE) * 100.0 + 0.5) / 100.0 AS price,
        |  floor(CAST(t.qty AS DOUBLE) * 100.0 + 0.5) / 100.0 AS qty
        |FROM pts t JOIN sky ON t.price = sky.price AND t.qty = sky.qty
        |ORDER BY price, l_partkey""".stripMargin,

    "q130_max_drawdown" ->
      """WITH r AS (SELECT user_id, value,
        |    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM events WHERE value > 0)
        |SELECT user_id, count(*) AS n_obs, max(value) AS peak_value,
        |  floor(max((peak - value) / peak) * 1000000.0 + 0.5) / 1000000.0
        |    AS max_drawdown
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}

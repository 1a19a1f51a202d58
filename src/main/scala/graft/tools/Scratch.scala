package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-benchmark (deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Bench.genOhlcv(spark, 600000).cache()
    df.count()
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("agg_simple") {
      df.agg(count(lit(1)), min(col("timestamp")), max(col("timestamp")),
        sum(when(col("close").isNull, 1).otherwise(0)),
        avg(col("high") - col("low")), max(col("high") - col("low")),
        min(col("close")), max(col("close")), count(col("close"))).collect()
    }
    t("agg_plus_median") {
      df.agg(count(lit(1)), min(col("timestamp")), max(col("timestamp")),
        sum(when(col("close").isNull, 1).otherwise(0)),
        avg(col("high") - col("low")), max(col("high") - col("low")),
        min(col("close")), max(col("close")), median(col("close")),
        count(col("close"))).collect()
    }
    t("median_alone") {
      df.agg(median(col("close"))).collect()
    }
    t("histogram_bucket") {
      df.groupBy(floor((col("close") - lit(1.0)) / lit(0.0001)).as("b"))
        .agg(count(lit(1)).as("n")).collect()
    }
    t("count_only") { df.agg(count(lit(1))).collect() }
    t("minmax_ts") { df.agg(min(col("timestamp")), max(col("timestamp"))).collect() }
    t("minmax_close") { df.agg(min(col("close")), max(col("close"))).collect() }
    t("null_sums") {
      df.agg(sum(when(col("close").isNull, 1).otherwise(0)),
        sum(when(col("open").isNull, 1).otherwise(0)),
        sum(when(col("high").isNull, 1).otherwise(0)),
        sum(when(col("low").isNull, 1).otherwise(0)),
        sum(when(col("volume").isNull, 1).otherwise(0))).collect()
    }
    t("range_stats") {
      df.agg(avg(col("high") - col("low")), max(col("high") - col("low"))).collect()
    }
    println(s"partitions: ${df.rdd.getNumPartitions}")
    spark.stop()
  }
}

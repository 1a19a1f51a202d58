package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from a driver-generated one by
  * unioning `factor` key-shifted copies (copy 0 is the identity), e.g.
  * sf0.1 → sf1. The driver's testdata is read-only and tops out at sf0.1;
  * the scale REHEARSAL (VERDICT r9 item 4: does any operator grow
  * super-linearly?) needs an order of magnitude more rows with the same
  * shape. Key spaces are shifted per copy so cardinalities scale with the
  * data (10× users, 10× orders — the "more users, same window" growth
  * model); foreign keys shift by the same constants so join fan-out per
  * key stays flat, exactly how the real corpus would grow. Dimension
  * tables (region/nation) stay single-copy. Text/embedding payloads
  * repeat verbatim — so dup rates rise with scale, which is the realistic
  * direction for a crawl corpus and stresses the dedup bucket caps.
  *
  * Usage: ScaleGen <srcSfDir> <outDir> <factor>
  */
object ScaleGen {
  // key-shift strides, comfortably above any source key range
  private val C = 10000000L   // custkey / user_id / partkey stride
  private val S = 1000000L    // suppkey / vec_id stride
  private val O = 1000000000L // orderkey / event_id / doc_id stride

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(shift: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until factor).map(c => shift(df, c.toLong)).reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    def rd(name: String): DataFrame =
      if (name == "events") graft.core.Tables.events(spark, src)
      else spark.read.parquet(s"$src/$name.parquet")

    // dims: pass through once
    for (t <- Seq("region", "nation")) write(t, rd(t))

    write("customer", copies(rd("customer")) { (d, c) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(c * C)) })
    write("supplier", copies(rd("supplier")) { (d, c) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(c * S)) })
    write("part", copies(rd("part")) { (d, c) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(c * C)) })
    write("orders", copies(rd("orders")) { (d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(c * O))
        .withColumn("o_custkey", col("o_custkey") + lit(c * C)) })
    write("lineitem", copies(rd("lineitem")) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * O))
        .withColumn("l_partkey", col("l_partkey") + lit(c * C))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * S)) })
    // ts jitter per copy (a prime ~1.6 min stride): without it every copy
    // lands in the SAME (type, minute) buckets and the co-activity pair
    // volume grows ~300x for 10x rows (measured) — organic growth spreads
    // new users across the window, growing buckets ~linearly. The jitter
    // keeps per-bucket density near the source's, which is the growth
    // model the 15x alarm rule assumes; the identical-stamp variant is a
    // separate worst-case stress, not the rehearsal baseline.
    write("events", copies(rd("events")) { (d, c) =>
      d.withColumn("event_id", col("event_id") + lit(c * O))
        .withColumn("user_id", col("user_id") + lit(c * C))
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${c * 97} SECONDS")) })
    write("documents", copies(rd("documents")) { (d, c) =>
      d.withColumn("doc_id", col("doc_id") + lit(c * O)) })
    write("embeddings", copies(rd("embeddings")) { (d, c) =>
      d.withColumn("vec_id", col("vec_id") + lit(c * S)) })

    spark.stop()
  }
}

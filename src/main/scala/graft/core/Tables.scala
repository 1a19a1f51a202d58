package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under an `sfDir` such as
  * `/root/testdata/sf0.01`. At 100 TB these become partitioned
  * directories; `spark.read.parquet` handles both shapes, and all
  * downstream operators are written against the schema, not the layout.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical shape the driver last wrote:
    * nanosecond parquet (Spark 4 refuses to read as timestamp — read as raw
    * long via legacy conf and truncate to micros, matching DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast; integer `div`, not `/`: epoch-ns exceeds
    * 2^53 and double math would corrupt it) or microsecond TIMESTAMP_NTZ
    * (cast to TimestampType — the session tz is pinned UTC, so the cast is
    * value-preserving and matches DuckDB's naive-timestamp semantics).
    * Downstream operators always see `ts: TimestampType`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

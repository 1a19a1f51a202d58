package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable as-of join: for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key (the Q12 semantic — "latest
  * order at-or-before each event, per user").
  *
  * Shape: tag both sides, union, repartition by key, sort within partitions
  * by (key, ts, side), then one forward scan carrying the last-seen right
  * row. ONE shuffle of combined size — no range-join explosion, no
  * per-row subquery. This is the standard distributed as-of algorithm
  * (merge-scan over co-partitioned sorted runs); skewed keys shard
  * naturally because state per key is a single row.
  *
  * The decorrelated join+regroup form (RelationalQueries q12) is kept for
  * the oracle gate; this operator is the 100 TB path.
  */
object AsofJoin {

  /** @param left     probe side (keeps all rows)
    * @param right    reference side (latest at-or-before row is attached)
    * @param keyCols  equi-join keys
    * @param leftTs   event-time column on the left
    * @param rightTs  event-time column on the right
    * @param pickCols right-side columns to attach (null when no match)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String,
           pickCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    val leftFields = left.schema.fields.toSeq
    val outSchema = StructType(
      leftFields.map(_.copy(nullable = true)) ++
        pickCols.map(c => right.schema(c).copy(
          name = s"asof_$c", nullable = true)))

    // unified shape: key cols, ts, side flag, left payload, right payload
    val unionSchema = StructType(
      keyCols.map(c => left.schema(c).copy(nullable = true)) ++ Seq(
        StructField("_ts", TimestampType),
        StructField("_side", IntegerType, nullable = false),
        StructField("_left", StructType(leftFields), nullable = true),
        StructField("_right", StructType(
          pickCols.map(c => right.schema(c))), nullable = true)))

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).cast(TimestampType).as("_ts"),
        lit(1).as("_side"),
        struct(leftFields.map(f => col(f.name)): _*).as("_left"),
        lit(null).cast(unionSchema("_right").dataType).as("_right")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).cast(TimestampType).as("_ts"),
        lit(0).as("_side"), // right sorts BEFORE left at equal ts (<=)
        lit(null).cast(unionSchema("_left").dataType).as("_left"),
        struct(pickCols.map(col): _*).as("_right")): _*)

    val combined = l.unionByName(r)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(
        (keyCols.map(col) :+ col("_ts") :+ col("_side")): _*)

    val kIdx = keyCols.indices.toArray
    val n = keyCols.length
    combined.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var lastRight: Row = null
      it.flatMap { row =>
        val key = kIdx.map(row.get(_)).toSeq
        if (key != curKey) { curKey = key; lastRight = null }
        if (row.getInt(n + 1) == 0) { // right side: update state
          lastRight = row.getStruct(n + 3)
          Iterator.empty
        } else {
          val leftRow = row.getStruct(n + 2)
          val attached =
            if (lastRight == null) pickCols.map(_ => null)
            else lastRight.toSeq
          Iterator.single(new GenericRowWithSchema(
            (leftRow.toSeq ++ attached).toArray, outSchema): Row)
        }
      }
    }(Encoders.row(outSchema))
  }
}

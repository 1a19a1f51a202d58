package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalable as-of join: for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key (the Q12 semantic — "latest
  * order at-or-before each event, per user").
  *
  * Shape: tag both sides, union, partition, sort within partitions by
  * (key, ts, side), then one forward scan carrying the last-seen right
  * row. ONE shuffle of combined size — no range-join explosion, no
  * per-row subquery. This is the standard distributed as-of algorithm
  * (merge-scan over co-partitioned sorted runs). Per-key STATE is one
  * row, but the default hash layout still scans one key's entire
  * timeline through a single task — a straggler ceiling for a hot key.
  *
  * `crossPartition = true` removes that ceiling with FastFill's range
  * layout + boundary seeds (`FastFill.scala` — the same technique, much
  * smaller state): the unified stream is RANGE-partitioned on (key, ts,
  * side) so a hot key spans consecutive partitions, and a fixed-size
  * seed job supplies each partition with the latest right-side row from
  * earlier partitions of its first key. The layout is pinned with an
  * eager `localCheckpoint` so the seed pass and the scan observe ONE
  * partitioning (uncached range exchanges re-sample bounds per job).
  * Driver/seed memory is O(partitions × keys-per-boundary), never
  * row-shaped data.
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
    * @param crossPartition range-partition on (key, ts) with boundary
    *                 seeds so one hot key's timeline parallelizes across
    *                 tasks; the default hash layout scans each key in one
    *                 task (fine when no key dominates a partition)
    * @param direction "backward" (latest right at-or-before, the default)
    *                 or "forward" (earliest right at-or-after — the
    *                 next-quote-after-trade variant). Only the scan order
    *                 changes: forward sorts event time DESCENDING within
    *                 the key so the same last-seen carry yields the
    *                 earliest at-or-after row; the merge-scan, seed pass
    *                 and state size are direction-agnostic.
    * @param toleranceSec pandas-merge_asof-style match window: when set,
    *                 a carried right row older (backward) / newer
    *                 (forward) than the left row by MORE than this many
    *                 seconds attaches as null instead. Implemented by
    *                 carrying the right row's event time through the
    *                 union struct (and therefore through the
    *                 cross-partition seeds unchanged) and comparing at
    *                 microsecond precision in the emit — the scan shape,
    *                 state size and seed protocol are untouched.
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String,
           pickCols: Seq[String],
           crossPartition: Boolean = false,
           direction: String = "backward",
           toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
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
        // the right payload always carries its own event time as a final
        // `_rts` field (stripped on emit) so the tolerance check — and
        // the seed carry across partitions — need no extra plumbing
        StructField("_right", StructType(
          pickCols.map(c => right.schema(c)) :+
            StructField("_rts", TimestampType)), nullable = true)))

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
        struct((pickCols.map(col) :+
          col(rightTs).cast(TimestampType).as("_rts")): _*).as("_right")): _*)

    // at equal ts the right side (_side = 0) must be SEEN first in scan
    // order so the match is inclusive — ascending _side does that under
    // both time directions
    val tsOrder =
      if (direction == "backward") col("_ts").asc else col("_ts").desc
    val sortCols = (keyCols.map(c => col(c).asc) :+ tsOrder :+ col("_side").asc)
    val unioned = l.unionByName(r)
    val combined =
      if (!crossPartition)
        unioned.repartition(keyCols.map(col): _*)
          .sortWithinPartitions(sortCols: _*)
      else
        // eager localCheckpoint PINS the sampled range bounds: every
        // downstream job (the seed pass, the scan) reads these exact
        // materialized partitions instead of re-executing the exchange
        unioned.repartitionByRange(sortCols: _*)
          .sortWithinPartitions(sortCols: _*)
          .localCheckpoint()

    val kIdx = keyCols.indices.toArray
    val n = keyCols.length

    // per-partition carry-in: key of the partition's FIRST run -> latest
    // right row for that key in EARLIER partitions (range layout only)
    val seeds: Map[(Int, List[Any]), Row] =
      if (crossPartition) buildSeeds(combined, n) else Map.empty

    combined.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var curKey: Seq[Any] = null
      var lastRight: Row = null
      it.flatMap { row =>
        val key = kIdx.map(row.get(_)).toSeq
        if (key != curKey) {
          curKey = key
          lastRight =
            if (seeds.isEmpty) null
            else seeds.getOrElse((pid, key.toList), null)
        }
        if (row.getInt(n + 1) == 0) { // right side: update state
          lastRight = row.getStruct(n + 3)
          Iterator.empty
        } else {
          val leftRow = row.getStruct(n + 2)
          val withinTol = lastRight != null && (toleranceSec match {
            case None => true
            case Some(tol) =>
              val lts = row.getTimestamp(n)
              val rts = lastRight.getTimestamp(pickCols.length)
              lts != null && rts != null && {
                def us(t: java.sql.Timestamp): Long = {
                  val i = t.toInstant
                  i.getEpochSecond * 1000000L + i.getNano / 1000L
                }
                val diff = if (direction == "backward") us(lts) - us(rts)
                  else us(rts) - us(lts)
                diff <= tol * 1000000L
              }
          })
          val attached =
            if (!withinTol) pickCols.map(_ => null)
            else lastRight.toSeq.dropRight(1) // strip _rts
          Iterator.single(new GenericRowWithSchema(
            (leftRow.toSeq ++ attached).toArray, outSchema): Row)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** pandas merge_asof `direction='nearest'` parity: for each left row,
    * the right row minimizing |rightTs − leftTs| within the same key,
    * ties resolved BACKWARD (the earlier right row — pandas' rule).
    * Composed from the two directional merge-scans joined back on a
    * caller-supplied unique left id (`leftIdCol`): each scan stays the
    * streaming one-shuffle single-row-state shape, and the chooser is a
    * plain projection — no partition buffering, no lookahead state.
    * `toleranceSec` bounds the winning match like the directional form.
    *
    * CONTRACT: `leftIdCol` must be unique per left row — the two
    * directional scans rejoin on it, so a duplicated id fans out into
    * duplicated (and wrongly-chosen) result rows with no error.
    * `assertUniqueIds = true` buys a loud failure instead for the price
    * of one count aggregate over the left side — turn it on anywhere the
    * id column isn't structurally unique (a real key, a generated
    * monotonic id) by construction.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftIdCol: String, leftTs: String, rightTs: String,
                  pickCols: Seq[String],
                  toleranceSec: Option[Long] = None,
                  assertUniqueIds: Boolean = false): DataFrame = {
    if (assertUniqueIds) {
      val a = left.agg(count(lit(1)).as("n"),
        countDistinct(col(leftIdCol)).as("d")).head()
      require(a.getLong(0) == a.getLong(1),
        s"asofNearest: leftIdCol '$leftIdCol' is not unique " +
          s"(${a.getLong(0)} rows, ${a.getLong(1)} distinct) — the " +
          "back/forward rejoin would fan out")
    }
    val pick = (pickCols :+ rightTs).distinct
    val back = asof(left, right, keyCols, leftTs, rightTs, pick,
      direction = "backward", toleranceSec = toleranceSec)
    val fwd = asof(left, right, keyCols, leftTs, rightTs, pick,
        direction = "forward", toleranceSec = toleranceSec)
      .select((col(leftIdCol).as("_fid") +:
        pick.map(c => col(s"asof_$c").as(s"_f_$c"))): _*)
    val joined = back.join(fwd, col(leftIdCol) === col("_fid"), "left")
    val bTs = col(s"asof_$rightTs")
    val fTs = col(s"_f_$rightTs")
    // backward wins on ties (<=): lts−bts <= fts−lts, all µs-exact
    val useBack = bTs.isNotNull && (fTs.isNull ||
      unix_micros(col(leftTs)) - unix_micros(bTs) <=
        unix_micros(fTs) - unix_micros(col(leftTs)))
    val out = left.columns.map(col).toSeq ++ pickCols.map(c =>
      when(useBack, col(s"asof_$c")).otherwise(col(s"_f_$c"))
        .as(s"asof_$c"))
    joined.select(out: _*)
  }

  /** One fixed-size metadata job over the pinned layout + a driver prefix
    * fold: each partition emits one row per key-run — (pid, key, last
    * right payload in the run, or null) — and the driver walks each key's
    * runs in partition order so partition p's carry-in is the latest
    * right row any earlier partition saw. Mirrors `FastFill.buildSeeds`
    * with single-row state.
    */
  private def buildSeeds(combined: DataFrame, n: Int)
      : Map[(Int, List[Any]), Row] = {
    val schema = combined.schema
    val kIdx = (0 until n).toArray
    val sumSchema = StructType(
      StructField("_pid", IntegerType, nullable = false) +:
        (schema.fields.take(n) :+ schema.fields(n + 3)))
    val runs = combined.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
      var key: List[Any] = null
      var lastRight: Row = null
      def flush(): Unit = if (key != null)
        acc += Row.fromSeq(pid +: key :+ lastRight)
      while (it.hasNext) {
        val row = it.next()
        val k = kIdx.map(row.get(_)).toList
        if (k != key) { flush(); key = k; lastRight = null }
        if (row.getInt(n + 1) == 0) lastRight = row.getStruct(n + 3)
      }
      flush()
      acc.iterator
    }(Encoders.row(sumSchema)).collect()

    val seeds = scala.collection.mutable.Map.empty[(Int, List[Any]), Row]
    for ((key, rows0) <- runs.groupBy(r => (1 to n).map(r.get).toList)) {
      var carry: Row = null
      for (r <- rows0.sortBy(_.getInt(0))) {
        if (carry != null) seeds((r.getInt(0), key)) = carry
        if (!r.isNullAt(n + 1)) carry = r.getStruct(n + 1)
      }
    }
    seeds.toMap
  }
}

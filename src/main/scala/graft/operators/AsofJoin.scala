package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * The scan runs at the `InternalRow` level (`queryExecution.toRdd` in,
  * [[GraftSqlBridge.internalCreateDataFrame]] out, the FastFill
  * convention): timestamps are bare epoch-micros longs, the carried
  * right row is one `UnsafeRow` struct copy, and each output row is a
  * `JoinedRow` over a byte-copied left struct plus a small attach row
  * rebuilt only when the carry changes — no external-Row encoder, no
  * per-field boxing on the 99% path.
  *
  * `crossPartition = true` removes the hot-key ceiling with FastFill's
  * range layout + boundary seeds (`FastFill.scala` — the same technique,
  * much smaller state): the unified stream is RANGE-partitioned on
  * (key, ts, side) so a hot key spans consecutive partitions, and a
  * fixed-size seed job supplies each partition with the latest
  * right-side row from earlier partitions of its first key. The layout
  * is pinned with an eager `localCheckpoint` so the seed pass and the
  * scan observe ONE partitioning (uncached range exchanges re-sample
  * bounds per job). Driver/seed memory is O(partitions ×
  * keys-per-boundary), never row-shaped data.
  *
  * The decorrelated join+regroup form (RelationalQueries q12) is kept for
  * the oracle gate; this operator is the 100 TB path.
  */
object AsofJoin {

  /** One (partition, key-run) seed record: the run's last right payload
    * (an owned `InternalRow` copy, null when the run had no right row).
    */
  private final case class AsofRun(pid: Int, key: List[Any],
                                   lastRight: InternalRow)

  private def externalizeKey(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case x => x
  }

  /** Canonical form of a key value for run detection and seed lookup,
    * matching Spark SQL's join/grouping key semantics for fractional
    * types (ADVICE r16): all NaN bit patterns collapse to the one
    * canonical NaN (Spark treats NaN = NaN as TRUE in join keys) and
    * -0.0 collapses to +0.0 (Spark normalizes the zero sign before
    * hashing), so a key run never splits — and a cross-partition seed
    * is never missed — on a bit-pattern difference a Spark equi-join
    * would ignore. Everything else passes through unchanged.
    */
  private def canonKey(v: Any): Any = v match {
    case d: java.lang.Double =>
      if (d.doubleValue() == 0.0d) java.lang.Double.valueOf(0.0d)
      else if (java.lang.Double.isNaN(d.doubleValue()))
        java.lang.Double.valueOf(java.lang.Double.NaN)
      else d
    case f: java.lang.Float =>
      if (f.floatValue() == 0.0f) java.lang.Float.valueOf(0.0f)
      else if (java.lang.Float.isNaN(f.floatValue()))
        java.lang.Float.valueOf(java.lang.Float.NaN)
      else f
    case x => x
  }

  /** Key equality over canonicalized boxed values: `Objects.equals`, so
    * canonical NaN equals canonical NaN (java.lang.Double.equals is
    * bits-based — the NaN-safe semantics Spark SQL gives join keys),
    * while every other whitelisted type keeps its value-based equals
    * (UTF8String, boxed integrals, Decimal's compareTo-based equals).
    * Both arguments MUST have passed through [[canonKey]].
    */
  private def keyEq(a: Any, b: Any): Boolean = java.util.Objects.equals(a, b)

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

    val n = keyCols.length
    val keyTypes: Array[DataType] =
      unionSchema.fields.take(n).map(_.dataType)
    // sameKey (and the seed-map lookup) compare BOXED internal values —
    // value-equal for UTF8String/boxed primitives, but reference-equal for
    // BinaryType's Array[Byte] (every row would start a new key run and
    // silently reset the carry) and undefined for array/map/struct keys.
    // Mirror FastFill's guard: fail loudly at plan time, not silently at
    // scan time.
    // Fractional/decimal keys are whitelisted too (ADVICE r15), with
    // Spark SQL's join-key semantics (ADVICE r16): key values pass
    // through `canonKey` before run detection and seed storage/lookup,
    // so NaN keys form runs like any other value (Spark treats
    // NaN = NaN as TRUE for join/grouping keys — all bit patterns
    // collapse to one canonical NaN) and -0.0/+0.0 are one key (Spark
    // normalizes the zero sign), INCLUDING across a range-partition
    // boundary where the pre-r17 boxed hashCode mismatch dropped the
    // seed carry (AsofJoinSpec pins both corners). Decimal keys need no
    // canonicalization: Decimal.equals is compareTo-based, scale-stable.
    require(keyTypes.forall {
      case StringType | IntegerType | LongType | ShortType | ByteType |
           BooleanType | DateType | TimestampType | TimestampNTZType |
           FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }, "asofJoin: key columns must be string/numeric/boolean/date/timestamp" +
      " (key-run equality compares boxed internal values; binary and nested" +
      " keys compare by reference)")
    val nLeft = leftFields.length
    val rightStruct = unionSchema("_right").dataType.asInstanceOf[StructType]
    val nRight = rightStruct.length // pickCols + _rts
    val pickTypes: Array[DataType] =
      rightStruct.fields.take(pickCols.length).map(_.dataType)
    val backward = direction == "backward"
    val tolUs = toleranceSec.map(_ * 1000000L)

    // per-partition carry-in: key of the partition's FIRST run -> latest
    // right row for that key in EARLIER partitions (range layout only)
    val seeds: Map[(Int, List[Any]), InternalRow] =
      if (crossPartition) buildSeeds(combined, n, keyTypes, nRight)
      else Map.empty

    val outRdd = combined.queryExecution.toRdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var curKey: Array[Any] = null // owned internal values
      var lastRight: InternalRow = null // owned copy
      // the attach row is rebuilt only when the carry changes; it is
      // immutable thereafter, so every JoinedRow until the next right row
      // may share it (tolerance misses share the all-null instance)
      val nullAttach = new GenericInternalRow(pickCols.length)
      var attach: InternalRow = nullAttach
      def rebuildAttach(): Unit =
        if (lastRight == null) attach = nullAttach
        else {
          val a = new Array[Any](pickCols.length)
          var i = 0
          while (i < pickCols.length) {
            if (!lastRight.isNullAt(i)) a(i) = lastRight.get(i, pickTypes(i))
            i += 1
          }
          attach = new GenericInternalRow(a)
        }
      def sameKey(row: InternalRow): Boolean = {
        if (curKey == null) return false
        var i = 0
        while (i < n) {
          val v =
            if (row.isNullAt(i)) null
            else canonKey(row.get(i, keyTypes(i)))
          if (!keyEq(v, curKey(i))) return false
          i += 1
        }
        true
      }
      it.flatMap { row =>
        if (!sameKey(row)) {
          curKey = Array.tabulate(n)(i =>
            if (row.isNullAt(i)) null
            else canonKey(InternalRow.copyValue(row.get(i, keyTypes(i)))))
          lastRight =
            if (seeds.isEmpty) null
            else seeds.getOrElse(
              (pid, curKey.map(externalizeKey).toList), null)
          rebuildAttach()
        }
        if (row.getInt(n + 1) == 0) { // right side: update state
          lastRight = row.getStruct(n + 3, nRight).copy()
          rebuildAttach()
          Iterator.empty
        } else {
          val withinTol = lastRight != null && (tolUs match {
            case None => true
            case Some(tol) =>
              !row.isNullAt(n) && !lastRight.isNullAt(pickCols.length) && {
                val lts = row.getLong(n)
                val rts = lastRight.getLong(pickCols.length)
                (if (backward) lts - rts else rts - lts) <= tol
              }
          })
          // the left struct is a view into the scan's reused buffer —
          // byte-copy it; the attach row is already owned and shared
          val leftCopy = row.getStruct(n + 2, nLeft).copy()
          Iterator.single(
            new JoinedRow(leftCopy, if (withinTol) attach else nullAttach)
              : InternalRow)
        }
      }
    }
    GraftSqlBridge.internalCreateDataFrame(
      left.sparkSession, outRdd, outSchema)
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
    * fold: each partition emits one record per key-run — (pid, key, last
    * right payload in the run, or null) — and the driver walks each key's
    * runs in partition order so partition p's carry-in is the latest
    * right row any earlier partition saw. Mirrors `FastFill.buildSeeds`
    * with single-row state; rides the same physical RDD as the scan.
    */
  private def buildSeeds(combined: DataFrame, n: Int,
                         keyTypes: Array[DataType], nRight: Int)
      : Map[(Int, List[Any]), InternalRow] = {
    val runs: Array[AsofRun] = combined.queryExecution.toRdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val acc = scala.collection.mutable.ArrayBuffer.empty[AsofRun]
      var keyInt: Array[Any] = null
      var lastRight: InternalRow = null
      def flush(): Unit = if (keyInt != null)
        acc += AsofRun(pid, keyInt.map(externalizeKey).toList, lastRight)
      def sameKey(row: InternalRow): Boolean = {
        if (keyInt == null) return false
        var i = 0
        while (i < n) {
          val v =
            if (row.isNullAt(i)) null
            else canonKey(row.get(i, keyTypes(i)))
          if (!keyEq(v, keyInt(i))) return false
          i += 1
        }
        true
      }
      while (it.hasNext) {
        val row = it.next()
        if (!sameKey(row)) {
          flush()
          keyInt = Array.tabulate(n)(i =>
            if (row.isNullAt(i)) null
            else canonKey(InternalRow.copyValue(row.get(i, keyTypes(i)))))
          lastRight = null
        }
        if (row.getInt(n + 1) == 0)
          lastRight = row.getStruct(n + 3, nRight).copy()
      }
      flush()
      acc.iterator
    }.collect()

    val seeds = scala.collection.mutable.Map.empty[(Int, List[Any]), InternalRow]
    for ((key, runs0) <- runs.groupBy(_.key)) {
      var carry: InternalRow = null
      for (r <- runs0.sortBy(_.pid)) {
        if (carry != null) seeds((r.pid, key)) = carry
        if (r.lastRight != null) carry = r.lastRight
      }
    }
    seeds.toMap
  }
}

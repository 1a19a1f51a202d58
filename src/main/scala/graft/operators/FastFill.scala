package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions.{col, min, unix_micros}
import org.apache.spark.sql.types._

/** Single-pass per-series gap filling: forward-fill + pandas-style linear
  * positional interpolation (limit_direction="both") in ONE partition scan.
  *
  * The window-algebra form ([[Interpolate]]) needs two global sorts per
  * pass (asc + desc running frames); for a single-symbol series those
  * serialize onto one task and dominate the pipeline. This operator instead
  * repartitions by the series key, sorts within partitions once, and runs a
  * linear forward scan with a per-gap backward fix-up — the same O(n) shape
  * pandas uses, but distributed across series.
  *
  * This is the deliberate `mapPartitions` escape hatch (SURVEY.md §7.4
  * preference order (d)): fill semantics are inherently sequential per
  * series, and one imperative scan replaces 3 window exchanges.
  *
  * Two distribution modes:
  *  - default (`crossPartition = false`): each series is fully contained in
  *    one partition (hash-by-key layout). Per-series memory is bounded by
  *    series length — fine when series are small, a straggler/spill risk
  *    for one huge series.
  *  - `crossPartition = true`: the input is RANGE-partitioned on
  *    (keys, ts) — one series may span many consecutive partitions, so a
  *    hot series parallelizes across tasks (the 100 TB skew answer). The
  *    scan stays narrow; cross-boundary state (grid continuation, ffill
  *    carry, interpolation neighbors) is computed by two cheap metadata
  *    jobs (per-series anchors + per-partition boundary summaries, both
  *    fixed-size per (partition, series)) and broadcast as seeds. Requires
  *    `assumeSorted` and `reindexStepMicros` (positions are grid indices,
  *    which are globally consistent; row-positional interpolation without a
  *    grid would need global row numbering).
  */
object FastFill {

  /** Cross-boundary state for one (partition, series): everything the
    * partition-local scan needs to behave exactly like a single global scan.
    */
  private final case class Seed(
      anchorUs: Long,                     // series' global first stamp
      prevGridUs: Long,                   // last on-grid stamp in earlier partitions (MinValue = none)
      ffillCarry: Array[Any],             // last non-null per ffill col in earlier partitions (null = none)
      inUs: Array[Long], inV: Array[Double],   // per interp col: last non-null (stamp, value) before
      inHas: Array[Boolean],
      outUs: Array[Long], outV: Array[Double], // per interp col: first non-null (stamp, value) after
      outHas: Array[Boolean])

  /** @param ffillCols   columns forward-filled (nulls take the previous
    *                    non-null value)
    * @param interpCols  columns linearly interpolated over row position
    *                    with both-direction edge fill
    * @param reindexStepMicros when set, the scan also performs the pandas
    *                    `reindex` inline: missing grid stamps (anchored at
    *                    each series' first stamp) are emitted as null rows
    *                    and off-grid source rows are dropped — no dense
    *                    grid materialization, no join
    * @param trueOnGenerated columns set to boolean true on generated grid
    *                    rows (pre-fill null flags for repair accounting)
    * @param assumeSorted caller guarantees the input is already partitioned
    *                    and sorted by (partitionCols, tsCol) within
    *                    partitions — the scan runs as a narrow mapPartitions
    *                    with NO shuffle and NO sort
    * @param crossPartition series may span consecutive ordered partitions
    *                    (range layout); see scaladoc above. The layout MUST
    *                    be pinned (cached/materialized): an uncached
    *                    repartitionByRange re-samples its bounds per job,
    *                    and the seed pass and fill scan must observe one
    *                    partitioning (a drift tripwire throws otherwise)
    */
  def fill(df: DataFrame, ffillCols: Seq[String], interpCols: Seq[String],
           tsCol: String, partitionCols: Seq[String] = Nil,
           reindexStepMicros: Option[Long] = None,
           trueOnGenerated: Seq[String] = Nil,
           assumeSorted: Boolean = false,
           crossPartition: Boolean = false): DataFrame = {
    if (ffillCols.isEmpty && interpCols.isEmpty && reindexStepMicros.isEmpty)
      return df
    require(!crossPartition || (assumeSorted && reindexStepMicros.isDefined &&
      partitionCols.nonEmpty),
      "crossPartition needs a sorted keyed layout and a reindex grid")
    val schema = df.schema
    val fIdx = ffillCols.map(schema.fieldIndex).toArray
    val iIdx = interpCols.map(schema.fieldIndex).toArray
    val kIdx = partitionCols.map(schema.fieldIndex).toArray
    val tsIdx = schema.fieldIndex(tsCol)
    val genIdx = trueOnGenerated.map(schema.fieldIndex).toArray
    // synthesized grid rows carry nulls in data columns regardless of the
    // input's nullability flags
    val outSchema = StructType(schema.fields.map(_.copy(nullable = true)))

    val prepared =
      if (assumeSorted && partitionCols.nonEmpty) df
      else
        (if (partitionCols.isEmpty) df.coalesce(1)
         else df.repartition(partitionCols.map(col): _*))
          .sortWithinPartitions((partitionCols :+ tsCol).map(col): _*)

    val seeds: Map[(Int, List[Any]), Seed] =
      if (crossPartition)
        buildSeeds(prepared, ffillCols, interpCols, tsCol, partitionCols,
          reindexStepMicros.get)
      else Map.empty

    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    val filled = prepared.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var pending: Row = _

        // Per-series rows are buffered ONCE, as bare Array[Any] field
        // arrays — the incoming Row wrapper is released immediately (the
        // 30× rehearsal caught the old double buffer, ArrayBuffer[Row]
        // plus a per-row array copy, GC-storming a 560k-row partition run:
        // repair measured 76× wall for 30× rows, almost all of it
        // collection time). Per-task retention is now one array + boxes
        // per buffered row — the unavoidable minimum for a scan whose
        // interpolation needs the gap's far edge.
        private def processSeries(rows: ArrayBuffer[Array[Any]]): Iterator[Row] = {
          val seed: Seed =
            if (seeds.isEmpty) null
            else seeds.getOrElse((pid, kIdx.map(rows.head.apply).toList), null)
          var firstEmitUs = Long.MinValue
          val vals = reindexStepMicros match {
            case None => rows
            case Some(stepUs) =>
              // inline reindex: keep on-grid rows, synthesize null rows for
              // missing stamps; anchor = first observed stamp of the SERIES
              // (seed-supplied when the series started in an earlier
              // partition). Epoch-micros come straight off the Timestamp
              // fields — no Instant allocation in the per-row loop.
              def stamp(us: Long): java.sql.Timestamp = {
                val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
                t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
                t
              }
              val out = new ArrayBuffer[Array[Any]](rows.length)
              val anchorUs =
                if (seed != null) seed.anchorUs
                else micros(rows.head(tsIdx).asInstanceOf[java.sql.Timestamp])
              // grid continuation: synthesis resumes right after the last
              // on-grid stamp of the previous partitions
              var prevUs =
                if (seed != null && seed.prevGridUs != Long.MinValue)
                  seed.prevGridUs
                else anchorUs - stepUs
              var firstOnGrid = true
              for (r <- rows) {
                val us = micros(r(tsIdx).asInstanceOf[java.sql.Timestamp])
                if ((us - anchorUs) % stepUs == 0 && us >= anchorUs) {
                  // tripwire: a seed pointing at-or-past the first local
                  // on-grid stamp means the exchange re-sampled different
                  // range bounds between the seed jobs and this scan — the
                  // caller must pin the layout (cache/materialize) first
                  if (firstOnGrid && seed != null &&
                      seed.prevGridUs != Long.MinValue && us <= seed.prevGridUs)
                    throw new IllegalStateException(
                      "FastFill crossPartition: input partitioning drifted " +
                        "between the seed pass and the fill scan — cache the " +
                        "layout before filling (range bounds are re-sampled " +
                        "per job on uncached plans)")
                  firstOnGrid = false
                  var g = prevUs + stepUs
                  while (g < us) { // synthesize the missing stamps
                    val a = new Array[Any](schema.length)
                    for (ki <- kIdx) a(ki) = r(ki)
                    a(tsIdx) = stamp(g)
                    for (gi <- genIdx) a(gi) = true
                    if (firstEmitUs == Long.MinValue) firstEmitUs = g
                    out += a
                    g += stepUs
                  }
                  if (firstEmitUs == Long.MinValue) firstEmitUs = us
                  out += r
                  prevUs = us
                } // off-grid rows drop (pandas reindex semantics)
              }
              out
          }
          val n = vals.length
          if (n == 0) return Iterator.empty
          val stepUs = reindexStepMicros.getOrElse(1L)
          // forward-fill columns (carry-in = last non-null of earlier
          // partitions — identical to one uninterrupted scan)
          var j = 0
          while (j < fIdx.length) {
            val ci = fIdx(j)
            var lastV: Any = if (seed != null) seed.ffillCarry(j) else null
            var i = 0
            while (i < n) {
              if (vals(i)(ci) == null) vals(i)(ci) = lastV
              else lastV = vals(i)(ci)
              i += 1
            }
            j += 1
          }
          // linear positional interpolation, both-direction edge fill.
          // Positions are grid indices (globally consistent), so virtual
          // neighbors from other partitions slot into the same arithmetic:
          // prev/next default to the seed's boundary points when the run
          // touches the partition edge.
          j = 0
          while (j < iIdx.length) {
            val ci = iIdx(j)
            var havePrev = false
            var prevPos = 0L
            var prevV = 0.0
            if (seed != null && seed.inHas(j)) {
              havePrev = true
              prevPos = (seed.inUs(j) - firstEmitUs) / stepUs
              prevV = seed.inV(j)
            }
            val haveOut = seed != null && seed.outHas(j)
            val outPos = if (haveOut) (seed.outUs(j) - firstEmitUs) / stepUs else 0L
            val outV = if (haveOut) seed.outV(j) else 0.0
            var runStart = 0
            var i = 0
            while (i <= n) {
              val isVal = i < n && vals(i)(ci) != null
              if (isVal || i == n) {
                if (runStart < i) { // a run of nulls in [runStart, i)
                  val haveNext = isVal || haveOut
                  val nextPos = if (isVal) i.toLong else outPos
                  val nextV =
                    if (isVal) vals(i)(ci).asInstanceOf[Double] else outV
                  var k = runStart
                  while (k < i) {
                    val filled: Any =
                      if (havePrev && haveNext)
                        prevV + (nextV - prevV) * (k - prevPos).toDouble /
                          (nextPos - prevPos)
                      else if (havePrev) prevV // trailing -> ffill
                      else if (haveNext) nextV // leading -> backfill
                      else null // all-null series
                    vals(k)(ci) = filled
                    k += 1
                  }
                }
                if (isVal) {
                  havePrev = true
                  prevPos = i
                  prevV = vals(i)(ci).asInstanceOf[Double]
                }
                runStart = i + 1
              }
              i += 1
            }
            j += 1
          }
          vals.iterator.map(a => new GenericRowWithSchema(a, outSchema): Row)
        }

        private def refill(): Unit = {
          if (pending == null && it.hasNext) pending = it.next()
          if (pending != null) {
            val keyArr = kIdx.map(pending.get)
            def sameKey(r: Row): Boolean = {
              var i = 0
              while (i < kIdx.length) {
                if (r.get(kIdx(i)) != keyArr(i)) return false
                i += 1
              }
              true
            }
            val buf = ArrayBuffer(pending.toSeq.toArray)
            pending = null
            var break = false
            while (!break && it.hasNext) {
              val r = it.next()
              if (sameKey(r)) buf += r.toSeq.toArray
              else { pending = r; break = true }
            }
            out = processSeries(buf)
          }
        }

        override def hasNext: Boolean = {
          if (!out.hasNext) refill()
          out.hasNext
        }
        override def next(): Row = { if (!hasNext) Iterator.empty.next(); out.next() }
      }
    }(Encoders.row(outSchema))

    // The degenerate single-series path ran on one partition; fan the result
    // back out so downstream aggregation/writes regain parallelism.
    if (partitionCols.isEmpty)
      filled.repartition(
        df.sparkSession.sessionState.conf.numShufflePartitions)
    else filled
  }

  /** Two fixed-size metadata jobs over the (cached) layout, then a driver
    * prefix/suffix scan — never row-shaped data:
    *  1. per-series anchors (min stamp): one partial-aggregated groupBy,
    *     one row per series;
    *  2. per-(partition, series) boundary summary: last on-grid stamp,
    *     last non-null per ffill col, first/last non-null per interp col —
    *     a narrow scan emitting one row per series-run.
    * The driver folds summaries in partition order into per-partition
    * carry-in/carry-out seeds. Driver memory is O(partitions × series) —
    * series-count ceilings are documented at the call sites (Runner keys by
    * SYMBOL; a catalog of millions of series should pre-split by key range).
    */
  private def buildSeeds(prepared: DataFrame, ffillCols: Seq[String],
                         interpCols: Seq[String], tsCol: String,
                         partitionCols: Seq[String],
                         stepUs: Long): Map[(Int, List[Any]), Seed] = {
    val schema = prepared.schema
    val kIdx = partitionCols.map(schema.fieldIndex).toArray
    val tsIdx = schema.fieldIndex(tsCol)
    val fIdx = ffillCols.map(schema.fieldIndex).toArray
    val iIdx = interpCols.map(schema.fieldIndex).toArray
    val nK = kIdx.length; val nF = fIdx.length; val nI = iIdx.length

    // job 1: series anchors
    val anchors: Map[List[Any], Long] = prepared
      .filter(col(tsCol).isNotNull)
      .groupBy(partitionCols.map(col): _*)
      .agg(min(unix_micros(col(tsCol))).as("_a"))
      .collect()
      .map(r => (0 until nK).map(r.get).toList -> r.getLong(nK))
      .toMap
    val anchorsB = prepared.sparkSession.sparkContext.broadcast(anchors)

    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // job 2: per-(partition, series) boundary summaries
    val sumSchema = StructType(
      Seq(StructField("_pid", IntegerType, nullable = false)) ++
        kIdx.map(i => schema.fields(i)) ++
        Seq(StructField("_lastGrid", LongType, nullable = true)) ++
        ffillCols.map(c => schema.fields(schema.fieldIndex(c))
          .copy(name = s"_ff_$c", nullable = true)) ++
        interpCols.flatMap(c => Seq(
          StructField(s"_inUs_$c", LongType, nullable = true),
          StructField(s"_inV_$c", DoubleType, nullable = true),
          StructField(s"_outUs_$c", LongType, nullable = true),
          StructField(s"_outV_$c", DoubleType, nullable = true))))
    val summaries = prepared.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val acc = ArrayBuffer.empty[Row]
      var key: List[Any] = null
      var lastGrid: java.lang.Long = null
      var ff: Array[Any] = null
      var inUs: Array[java.lang.Long] = null; var inV: Array[Any] = null
      var outUs: Array[java.lang.Long] = null; var outV: Array[Any] = null
      def flush(): Unit = if (key != null) {
        val fields = ArrayBuffer[Any](pid)
        fields ++= key
        fields += lastGrid
        fields ++= ff
        var j = 0
        while (j < nI) {
          // summary naming: _in* = LAST non-null (becomes later partitions'
          // carry-in), _out* = FIRST non-null (earlier partitions' carry-out)
          fields += inUs(j); fields += inV(j)
          fields += outUs(j); fields += outV(j)
          j += 1
        }
        acc += Row.fromSeq(fields.toSeq)
      }
      while (it.hasNext) {
        val r = it.next()
        if (r.isNullAt(tsIdx)) { /* null stamps never repair */ }
        else {
          val k = kIdx.map(r.get).toList
          if (k != key) {
            flush()
            key = k; lastGrid = null
            ff = new Array[Any](nF)
            inUs = new Array[java.lang.Long](nI); inV = new Array[Any](nI)
            outUs = new Array[java.lang.Long](nI); outV = new Array[Any](nI)
          }
          anchorsB.value.get(k).foreach { anchorUs =>
            val us = micros(r.getAs[java.sql.Timestamp](tsIdx))
            if ((us - anchorUs) % stepUs == 0 && us >= anchorUs) {
              lastGrid = us
              var j = 0
              while (j < nF) {
                val v = r.get(fIdx(j)); if (v != null) ff(j) = v
                j += 1
              }
              j = 0
              while (j < nI) {
                val v = r.get(iIdx(j))
                if (v != null) {
                  if (outUs(j) == null) { outUs(j) = us; outV(j) = v }
                  inUs(j) = us; inV(j) = v
                }
                j += 1
              }
            }
          }
        }
      }
      flush()
      acc.iterator
    }(Encoders.row(sumSchema)).collect()

    // driver fold: partition-ordered prefix (anchor, grid continuation,
    // ffill carry, interp carry-in) + suffix (interp carry-out) per series
    val byKey = summaries.groupBy(r => (1 to nK).map(r.get).toList)
    val seeds = scala.collection.mutable.Map.empty[(Int, List[Any]), Seed]
    for ((k, rows0) <- byKey) {
      val anchorUs = anchors.getOrElse(k, Long.MinValue)
      if (anchorUs != Long.MinValue) {
        val rows = rows0.sortBy(_.getInt(0))
        val base = 1 + nK
        // prefix pass
        var prevGrid = Long.MinValue
        val ffC = new Array[Any](nF)
        val ciUs = new Array[Long](nI); val ciV = new Array[Double](nI)
        val ciHas = new Array[Boolean](nI)
        val pre = rows.map { r =>
          val s = Seed(anchorUs, prevGrid, ffC.clone(),
            ciUs.clone(), ciV.clone(), ciHas.clone(),
            new Array[Long](nI), new Array[Double](nI), new Array[Boolean](nI))
          if (!r.isNullAt(base)) prevGrid = r.getLong(base)
          var j = 0
          while (j < nF) {
            val v = r.get(base + 1 + j); if (v != null) ffC(j) = v
            j += 1
          }
          j = 0
          while (j < nI) {
            val o = base + 1 + nF + j * 4
            if (!r.isNullAt(o)) { // last non-null of this partition
              ciUs(j) = r.getLong(o); ciV(j) = r.getDouble(o + 1)
              ciHas(j) = true
            }
            j += 1
          }
          (r.getInt(0), s)
        }
        // suffix pass for carry-out
        val coUs = new Array[Long](nI); val coV = new Array[Double](nI)
        val coHas = new Array[Boolean](nI)
        for (idx <- rows.indices.reverse) {
          val (pid, s) = pre(idx)
          System.arraycopy(coUs, 0, s.outUs, 0, nI)
          System.arraycopy(coV, 0, s.outV, 0, nI)
          System.arraycopy(coHas, 0, s.outHas, 0, nI)
          val r = rows(idx)
          var j = 0
          while (j < nI) {
            val o = base + 1 + nF + j * 4 + 2
            if (!r.isNullAt(o)) { // first non-null of this partition
              coUs(j) = r.getLong(o); coV(j) = r.getDouble(o + 1)
              coHas(j) = true
            }
            j += 1
          }
          seeds((pid, k)) = s
        }
      }
    }
    anchorsB.destroy()
    seeds.toMap
  }
}

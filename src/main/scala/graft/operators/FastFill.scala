package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

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
  * series, and one imperative scan replaces 3 window exchanges. Each series
  * is buffered in memory per-task — the 100 TB guidance is to partition so
  * one series (or time-chunk of a series) fits an executor, which the
  * SYMBOL layout already guarantees.
  */
object FastFill {

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
    * @param assumeSorted caller guarantees the input is already hash-
    *                    partitioned by `partitionCols` and sorted by
    *                    (partitionCols, tsCol) within partitions (the layout
    *                    Normalize's keyed dedup emits) — the scan runs as a
    *                    narrow mapPartitions with NO shuffle and NO sort
    */
  def fill(df: DataFrame, ffillCols: Seq[String], interpCols: Seq[String],
           tsCol: String, partitionCols: Seq[String] = Nil,
           reindexStepMicros: Option[Long] = None,
           trueOnGenerated: Seq[String] = Nil,
           assumeSorted: Boolean = false): DataFrame = {
    if (ffillCols.isEmpty && interpCols.isEmpty && reindexStepMicros.isEmpty)
      return df
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

    val filled = prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var pending: Row = _

        private def sameKey(a: Row, b: Row): Boolean =
          kIdx.forall(i => a.get(i) == b.get(i))

        private def processSeries(rows: ArrayBuffer[Row]): Iterator[Row] = {
          val vals = reindexStepMicros match {
            case None => rows.iterator.map(_.toSeq.toArray).to(ArrayBuffer)
            case Some(stepUs) =>
              // inline reindex: keep on-grid rows, synthesize null rows for
              // missing stamps; anchor = first observed stamp of the series.
              // Epoch-micros come straight off the Timestamp fields — no
              // Instant allocation in the per-row loop.
              def micros(t: java.sql.Timestamp): Long =
                Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
              def stamp(us: Long): java.sql.Timestamp = {
                val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
                t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
                t
              }
              val out = new ArrayBuffer[Array[Any]](rows.length)
              val anchorUs = micros(rows.head.getAs[java.sql.Timestamp](tsIdx))
              var prevUs = anchorUs - stepUs
              for (r <- rows) {
                val us = micros(r.getAs[java.sql.Timestamp](tsIdx))
                if ((us - anchorUs) % stepUs == 0) {
                  var g = prevUs + stepUs
                  while (g < us) { // synthesize the missing stamps
                    val a = new Array[Any](schema.length)
                    for (ki <- kIdx) a(ki) = r.get(ki)
                    a(tsIdx) = stamp(g)
                    for (gi <- genIdx) a(gi) = true
                    out += a
                    g += stepUs
                  }
                  out += r.toSeq.toArray
                  prevUs = us
                } // off-grid rows drop (pandas reindex semantics)
              }
              out
          }
          val n = vals.length
          // forward-fill columns
          for (j <- fIdx) {
            var lastV: Any = null
            var i = 0
            while (i < n) {
              if (vals(i)(j) == null) vals(i)(j) = lastV
              else lastV = vals(i)(j)
              i += 1
            }
          }
          // linear positional interpolation, both-direction edge fill
          for (j <- iIdx) {
            var prevI = -1
            var i = 0
            while (i <= n) {
              val isVal = i < n && vals(i)(j) != null
              if (isVal || i == n) {
                if (i - prevI > 1) { // a run of nulls in (prevI, i)
                  val pv = if (prevI >= 0)
                    vals(prevI)(j).asInstanceOf[Double] else Double.NaN
                  val nv = if (i < n)
                    vals(i)(j).asInstanceOf[Double] else Double.NaN
                  var k = prevI + 1
                  while (k < i) {
                    val filled: Any =
                      if (prevI < 0 && i == n) null // all-null series
                      else if (prevI < 0) nv // leading -> backfill
                      else if (i == n) pv // trailing -> ffill
                      else pv + (nv - pv) * (k - prevI).toDouble / (i - prevI)
                    vals(k)(j) = filled
                    k += 1
                  }
                }
                if (isVal) prevI = i
              }
              i += 1
            }
          }
          vals.iterator.map(a => new GenericRowWithSchema(a, outSchema): Row)
        }

        private def refill(): Unit = {
          if (pending == null && it.hasNext) pending = it.next()
          if (pending != null) {
            val buf = ArrayBuffer(pending)
            pending = null
            var break = false
            while (!break && it.hasNext) {
              val r = it.next()
              if (sameKey(buf.head, r)) buf += r
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
}

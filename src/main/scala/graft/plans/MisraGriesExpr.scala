package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra-Gries frequent-items sketch over a column of 64-bit key arrays —
  * the candidate pass of exact distributed heavy hitters.
  *
  * Why a sketch at all: exact term frequencies need a `groupBy(term)` whose
  * shuffle carries EVERY token occurrence (~10¹³ rows at 100 TB, and the
  * hot-term skew rides the shuffle key). But heavy hitters — items with
  * frequency ≥ n/k — admit a two-pass exact plan with a tiny fixed-size
  * first pass:
  *
  *  1. this aggregate builds a `capacity`-counter Misra-Gries summary per
  *     partition (map-side partial agg) and merges the partials; the final
  *     buffer is ≤ `capacity` (key, count) entries regardless of data size;
  *  2. the caller re-scans with a broadcast membership filter on the
  *     sketch's keys and exact-counts ONLY those — the shuffle shrinks from
  *     every occurrence to occurrences of ≤ `capacity` candidate keys.
  *
  * The guarantee that makes pass 2 exact (Misra & Gries 1982; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS'12): both the
  * decrement-on-overflow update and the subtract-(capacity+1)-th-count
  * merge reduce any key's counter by at most n/(capacity+1) in total, so
  * every item with true frequency > n/(capacity+1) still has a positive
  * counter — with capacity ≥ k, the sketch's key set is a SUPERSET of the
  * true ≥ n/k heavy hitters. False candidates cost only pass-2 counting;
  * the final exact filter removes them, so the result is deterministic
  * even though sketch contents depend on partition merge order.
  *
  * Keys are 64-bit hashes (`xxhash64(term)`), not strings: the buffer stays
  * 16 bytes/entry and update never touches UTF8 bytes. A hash collision
  * merely promotes a spurious candidate, which pass 2 filters out.
  *
  * Reference analog: none — the reference engine has no frequency-sketch
  * path; this is part of the 100 TB extension surface (SURVEY.md §2.5).
  */
case class MisraGriesKeys(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(capacity > 0, "misra_gries_keys capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // AbstractDataType (and thus ExpectsInputTypes) is private[sql] in
  // Spark 4 — the registration path casts the argument to array<bigint>.
  override def prettyName: String = "misra_gries_keys"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    new mutable.LongMap[Long](capacity * 2)

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val arr = child.eval(input)
    if (arr == null) return buf
    val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val k = a.getLong(i)
      val cur = buf.getOrElse(k, 0L) // counters are always ≥ 1
      if (cur > 0L) buf.update(k, cur + 1L)
      else if (buf.size < capacity) buf.update(k, 1L)
      else decrementAll(buf, 1L) // O(capacity), ≤ once per `capacity` adds
      i += 1
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (k, v) =>
      buf.update(k, buf.getOrElse(k, 0L) + v)
    }
    if (buf.size > capacity) {
      // mergeable-summaries rule: subtract the (capacity+1)-th largest
      // count from every counter, drop non-positives → ≤ capacity survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - capacity - 1))
    }
    buf
  }

  /** Subtract `d` from every counter, dropping non-positive ones. Iterates
    * a key snapshot — LongMap mutation during foreach is undefined.
    */
  private def decrementAll(buf: mutable.LongMap[Long], d: Long): Unit = {
    val keys = buf.keys.toArray
    var j = 0
    while (j < keys.length) {
      val v = buf(keys(j)) - d
      if (v <= 0L) buf.remove(keys(j)) else buf.update(keys(j), v)
      j += 1
    }
  }

  /** Candidate key set, ascending (stable output for a given buffer). */
  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new mutable.LongMap[Long](capacity * 2)
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesKeys =
    copy(child = newChildren.head)
}

package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch over a column of 64-bit keys — the mergeable
  * frequency-estimate companion to the Misra-Gries candidate sketch
  * (`MisraGriesExpr`): MG answers "which keys are heavy", CMS answers
  * "how often does THIS key occur" with a one-sided error bound
  * (Cormode & Muthukrishnan 2005): estimates never undercount, and
  * overcount by more than ε·N (ε = e/width) with probability ≤ e^-depth.
  *
  * Why it scales: the buffer is a FIXED depth×width counter matrix
  * (8·d·w bytes) regardless of input size, updates are map-side partial
  * aggregates, and the sketch is LINEAR — merging partitions is
  * elementwise addition, so partition order can't change the result
  * (bit-determinism the spec pins). At 100 TB the frequency table that
  * would need a full groupBy shuffle becomes one small binary per group.
  *
  * Row hashes are multiply-mix functions of (key, row-seed) — fixed
  * constants, no RNG — so the same data always builds the same sketch.
  * Keys are pre-hashed 64-bit values (`xxhash64(term)`), same contract
  * as `misra_gries_keys`.
  *
  * Reference analog: none — 100 TB extension surface (SURVEY.md §2.5).
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, "cms depth in 1..16")
  require(width > 1, "cms width must exceed 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val k = v.asInstanceOf[Long]
    var r = 0
    while (r < depth) {
      buf(r * width + CountMinSketchAgg.cell(k, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    CountMinSketchAgg.serializeCells(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMinSketchAgg.serializeCells(depth, width, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val (d, w, cells) = CountMinSketchAgg.deserializeCells(bytes)
    require(d == depth && w == width, "cms shape mismatch on deserialize")
    cells
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinSketchAgg = copy(child = c.head)
}

object CountMinSketchAgg {

  /** splitmix64 finalizer — the fixed per-row hash family. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Row-r cell index for key k. */
  def cell(k: Long, r: Int, width: Int): Int =
    Math.floorMod(mix(k ^ (0xA076_1D64_78BD_642FL * (r + 1))), width).toInt

  def serializeCells(depth: Int, width: Int,
                     cells: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + cells.length * 8)
    bb.putInt(depth); bb.putInt(width)
    var i = 0
    while (i < cells.length) { bb.putLong(cells(i)); i += 1 }
    bb.array()
  }

  def deserializeCells(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    val cells = new Array[Long](d * w)
    var i = 0
    while (i < cells.length) { cells(i) = bb.getLong; i += 1 }
    (d, w, cells)
  }

  /** Point estimate from a serialized sketch: min over the depth rows. */
  def estimate(bytes: Array[Byte], k: Long): Long = {
    val (d, w, cells) = deserializeCells(bytes)
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = cells(r * w + cell(k, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}

/** Scalar point query against a FOLDABLE serialized CMS (the
  * `bloom_might_contain` pattern: the sketch deserializes once at plan
  * construction and rides the closure as a reference constant; per-row
  * work is depth hash-and-min, codegen-resident).
  */
case class CmsEstimate(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private lazy val parsed =
    CountMinSketchAgg.deserializeCells(sketch)

  override def nullSafeEval(input: Any): Any = {
    val (d, w, cells) = parsed
    val k = input.asInstanceOf[Long]
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = cells(r * w + CountMinSketchAgg.cell(k, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsBytes", sketch, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CountMinSketchAgg.estimate($ref, $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimate = copy(child = newChild)
}

package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.util.sketch.BloomFilter

/** Native predicate testing a long key against a pre-built Bloom filter.
  *
  * The membership half of graft's incremental cross-corpus dedup
  * (`Dedup.notSeen`): the "seen" corpus is summarized ONCE into a
  * fixed-size sketch (`DataFrameStatFunctions.bloomFilter`, a distributed
  * aggregation whose result is a few MB regardless of corpus row count),
  * and the new batch is screened map-side — no shuffle, no join — with
  * the sketch's guarantee that a `false` answer is definitive. Only the
  * `true` rows (≈ fpp × batch + true duplicates) proceed to the exact
  * anti-join, so the shuffle the join pays is proportional to the
  * duplicate rate, not the batch size.
  *
  * The deserialized filter is attached to the plan as a reference
  * constant (`ctx.addReferenceObj`) — shipped once per task binary like a
  * closure constant. `BloomFilterImpl` is `Serializable`, and
  * `mightContainLong` is a pure read (thread-safe after construction), so
  * sharing one instance across a task's rows and across the executor's
  * concurrent tasks is sound. At multi-GB sketch sizes an explicit
  * `SparkContext.broadcast` would dedupe the per-executor copies; at the
  * 1e6–1e9-item / few-MB-to-~1 GB sketches this engine targets, plan
  * references are the same wire cost as a broadcast's one-time torrent.
  *
  * Construction goes through `GraftExtensions` ("bloom_might_contain"),
  * which folds a literal binary column into the deserialized filter at
  * plan-build time — the bytes never re-parse per row or per batch.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  // input typing is enforced by the GraftExtensions builder (Cast to long)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bf = ctx.addReferenceObj("graftBloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

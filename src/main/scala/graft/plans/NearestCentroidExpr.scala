package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (squared-L2
  * argmin) for an `array<double>` vector against a codebook baked in at
  * plan-construction time.
  *
  * The composable form (`array_min` over k `struct(aggregate(zip_with(...)))`
  * entries, Similarity.nearestCentroid) allocates k intermediate arrays and
  * evaluates 2k lambdas per row; this is one fused double loop over a
  * `double[][]` reference constant — the IVF assign step runs over the FULL
  * corpus (once for Lloyd training, once for bucketing), so per-row cost here
  * is the whole operator's cost at scale. Accumulation order per centroid
  * matches the HOF form (element order, += into one accumulator), so the
  * argmin is bit-identical; ties keep the lowest centroid index, matching
  * `array_min` over `struct(dist, idx)` lexicographic ordering.
  *
  * Null/edge semantics: null vector → null out; a vector containing a
  * null ELEMENT also yields null (the HOF form's zip_with/aggregate
  * propagates the null instead of scoring garbage — reading it as 0.0
  * would silently pick a wrong bucket). The element check is emitted only
  * when the array type admits nulls (`containsNull`), so schemas that
  * guarantee dense vectors pay nothing. A vector shorter than the
  * codebook dimension scores only the shared prefix (the caller
  * guarantees consistent dimensions — same contract as the HOF form).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  private def mayHaveNullElements: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) => cn
    case _ => true
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable || mayHaveNullElements
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (mayHaveNullElements) {
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        i += 1
      }
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      val m = math.min(n, row.length)
      var d = 0.0
      var i = 0
      while (i < m) {
        val diff = v.getDouble(i) - row(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cen = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val row = ctx.freshName("row")
      val hasNull = ctx.freshName("hasNull")
      val nullScan = if (mayHaveNullElements)
        s"""
           |boolean $hasNull = false;
           |for (int $j = 0; $j < $n; $j++) {
           |  if ($v.isNullAt($j)) { $hasNull = true; break; }
           |}
           |if ($hasNull) { ${ev.isNull} = true; } else {
         """.stripMargin
      else ""
      val nullScanEnd = if (mayHaveNullElements) "}" else ""
      s"""
         |int $n = $v.numElements();
         |$nullScan
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cen.length; $c++) {
         |  double[] $row = $cen[$c];
         |  int $m = $n < $row.length ? $n : $row.length;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $diff = $v.getDouble($i) - $row[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
         |$nullScanEnd
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

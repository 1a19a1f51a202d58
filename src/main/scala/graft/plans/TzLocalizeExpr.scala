package graft.plans

import java.time.{LocalDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Native Catalyst expression for DST-strict timezone localization —
  * pandas `tz_localize(tz, ambiguous="NaT", nonexistent="shift_forward")`
  * (reference: src/etl/transform/normalize.py:183-196):
  *  - ambiguous fall-back wall times → null, row retained;
  *  - nonexistent spring-forward wall times → shifted past the gap;
  *  - normal wall times → the unique instant.
  *
  * Graduation of the `TzLocalize` Scala UDF (SURVEY.md §7.4's declared
  * optional step, pattern proven by [[CosineSimilarity]]): the UDF forced a
  * serialize → JVM-object → deserialize round trip per row and broke the
  * surrounding whole-stage-codegen span; this form keeps the normalize
  * projection in one generated function operating on raw epoch micros.
  * Fixed-offset zones never reach either form — Normalize folds them into
  * codegen arithmetic — so this runs only for DST-bearing region zones.
  *
  * The zone is a plan-time constant (`zoneId`); its `ZoneRules` lookups are
  * JDK-cached and allocation-light (getValidOffsets allocates a tiny list;
  * the common single-offset case short-circuits inside the JDK).
  *
  * Input convention matches the UDF: the naive wall time arrives as a
  * TimestampType whose UTC rendering equals the wall-clock reading.
  */
case class TzLocalizeExpr(child: Expression, zoneId: String)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "tz_localize"

  @transient private lazy val zone: ZoneId = ZoneId.of(zoneId)

  override def nullSafeEval(input: Any): Any = {
    val r = TzLocalizeExpr.localizeMicros(input.asInstanceOf[Long], zone)
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.addReferenceObj("graftZone", zone, classOf[ZoneId].getName)
      val r = ctx.freshName("localized")
      s"""
         |long $r = graft.plans.TzLocalizeExpr.localizeMicros($c, $z);
         |if ($r == Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TzLocalizeExpr =
    copy(child = newChild)
}

object TzLocalizeExpr {

  /** Epoch-micros wall reading → epoch-micros instant under `zone`;
    * Long.MinValue encodes the ambiguous-NaT case. Static forwarder —
    * called from generated code.
    */
  def localizeMicros(wallUs: Long, zone: ZoneId): Long = {
    val secs = Math.floorDiv(wallUs, 1000000L)
    val fracUs = Math.floorMod(wallUs, 1000000L)
    val ldt = LocalDateTime.ofEpochSecond(secs, fracUs.toInt * 1000,
      ZoneOffset.UTC)
    val rules = zone.getRules
    val offsets = rules.getValidOffsets(ldt)
    if (offsets.size == 1)
      wallUs - offsets.get(0).getTotalSeconds * 1000000L
    else if (offsets.isEmpty) {
      // spring-forward gap: first valid instant after it
      val t = rules.getTransition(ldt)
      val inst = t.getDateTimeAfter.toInstant(t.getOffsetAfter)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    } else Long.MinValue // ambiguous fall-back: NaT
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: symmetric per-vector int8 quantization of
  * an `array<float|double>` embedding in one fused pass —
  * `scale = max(absmax/127, 1e-30)`, `qvec_i = cast(round(x_i/scale) as
  * long)` — returning `struct<scale: double, qvec: array<long>>`.
  *
  * Exists because the column-algebra formulation is structurally slow
  * and cannot be made reliably fast: building scale and qvec in one
  * `select` pastes the scale tree into the `transform` lambda body
  * (re-evaluated PER ELEMENT — ~12k interpreted lambda evals/row), and
  * the split-projection workaround survives only while `scale` stays in
  * the query output; the moment column pruning drops it, the alias is
  * single-use and CollapseProject re-inlines it into the lambda. A fused
  * kernel has no such failure mode: one absmax pass, one rounding pass,
  * no intermediate double array, whole-stage codegen friendly.
  *
  * Value parity with the HOF form is exact: elements widen to double
  * in-loop (exact for float), division order is identical, and rounding
  * replays Spark's own `round(_, 0)` double path
  * (`BigDecimal.valueOf(v).setScale(0, HALF_UP)`) so qvec/scale are
  * bit-identical with the `transform`/`array_max` formulation and the
  * DuckDB oracle (spec-pinned in QuantizeInt8Spec, incl. negative-half
  * ties where HALF_UP differs from Math.round).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double|float> input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_quantize_int8"

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val float = isFloat
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = if (float) arr.getFloat(i).toDouble else arr.getDouble(i)
      mx = math.max(mx, math.abs(v))
      i += 1
    }
    val scale = math.max(mx / 127.0, 1e-30)
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val v = if (float) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = QuantizeInt8.roundHalfUpToLong(v / scale)
      i += 1
    }
    InternalRow(scale, new GenericArrayData(out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val get = if (isFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      val rowCls = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      val helper = QuantizeInt8.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $mx = java.lang.Math.max($mx, java.lang.Math.abs($get($i)));
         |}
         |double $scale = java.lang.Math.max($mx / 127.0, 1e-30);
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $get($i) / $scale;
         |  $out[$i] = $helper.roundHalfUpToLong($v);
         |}
         |${ev.value} = new $rowCls(new Object[] {
         |  (Object) java.lang.Double.valueOf($scale),
         |  (Object) ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($out)
         |});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Spark's `round(double, 0)` then `cast(_ as bigint)`: decimal
    * HALF_UP on the shortest decimal rendering (BigDecimal.valueOf), so
    * -2.5 → -3 (away from zero), unlike Math.round's -2. Non-finite
    * inputs pass through the cast alone, mirroring Round's guard. */
  def roundHalfUpToLong(v: Double): Long =
    if (java.lang.Double.isNaN(v)) 0L
    else if (java.lang.Double.isInfinite(v)) {
      if (v > 0) Long.MaxValue else Long.MinValue
    } else {
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .longValue()
    }
}

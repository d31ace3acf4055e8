package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression: all per-plane dot products of a numeric
  * vector against a FOLDABLE plane matrix, as one `array<double>` — the
  * matrix–vector kernel behind [[graft.operators.Similarity
  * .randomProjection]] (JL projection runs k of these per row).
  *
  * The composable form builds k separate interpreted
  * `aggregate(zip_with(v, planeLit))` folds — k allocations and k
  * interpreted loops per row under a k×dim-literal expression tree
  * (emb_random_projection scaled 0.16 → 0.85 s across 10× rows on
  * exactly this). One fused loop here; same left-to-right double
  * accumulation per plane, so values are bit-identical.
  *
  * Null algebra mirrors the fold exactly: each component is the fold's
  * dot, so a null element or a length-mismatched vector (null-padded by
  * zip_with) nulls EVERY component — the result is an array of k nulls,
  * never a null array (`array(...)` of null dots is itself non-null).
  * A null input vector likewise yields k null components.
  */
case class ProjectPlanes(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (DoubleType | FloatType | LongType | IntegerType), _) =>
      Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double|float|long|int> vector, " +
          s"got ${left.dataType.simpleString}")
    else if (!right.foldable || (right.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => false
        case _ => true
      }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<array<double>> plane " +
          s"matrix, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  // never null itself: an invalid vector yields an array of null
  // components (the fold form's array(comps) is non-null even when
  // every comp is), matching the HOF algebra exactly
  override def nullable: Boolean = false

  override def prettyName: String = "graft_project_planes"

  @transient private lazy val planes: Array[Array[Double]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { p =>
      arr.getArray(p).toDoubleArray()
    }
  }

  /** The constant all-null result for invalid vectors. */
  @transient private lazy val nullRow: GenericArrayData =
    new GenericArrayData(new Array[Any](planes.length))

  @inline private def get(arr: ArrayData, et: DataType, i: Int): Double =
    et match {
      case DoubleType => arr.getDouble(i)
      case FloatType => arr.getFloat(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case other => throw new IllegalStateException(
        s"$prettyName: unsupported element type $other")
    }

  private def compute(v: ArrayData, et: DataType): ArrayData = {
    val n = v.numElements()
    if (planes.length > 0 && n != planes(0).length) return nullRow
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return nullRow; i += 1 }
    val out = new Array[Double](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += get(v, et, j) * plane(j); j += 1 }
      out(p) = dot
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) nullRow
    else compute(v.asInstanceOf[ArrayData], elemType(left.dataType).get)
  }

  private def genGet(arr: String, et: DataType, i: String): String = et match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case other => throw new IllegalStateException(
      s"$prettyName: unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val a = leftGen.value
    val pl = ctx.addReferenceObj("planes", planes, "double[][]")
    val nulls = ctx.addReferenceObj("nullRow", nullRow,
      classOf[GenericArrayData].getName)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val dot = ctx.freshName("dot")
    val plane = ctx.freshName("plane")
    val ok = ctx.freshName("ok")
    val out = ctx.freshName("out")
    val getV = genGet(a.toString, elemType(left.dataType).get, j)
    ev.copy(
      code = code"""
        ${leftGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $nulls;
        if (!${leftGen.isNull}) {
          int $n = $a.numElements();
          boolean $ok = ($pl.length == 0 || $n == $pl[0].length);
          for (int $i = 0; $ok && $i < $n; $i++) {
            if ($a.isNullAt($i)) $ok = false;
          }
          if ($ok) {
            double[] $out = new double[$pl.length];
            for (int $p = 0; $p < $pl.length; $p++) {
              double[] $plane = $pl[$p];
              double $dot = 0.0;
              for (int $j = 0; $j < $n; $j++) {
                $dot += $getV * $plane[$j];
              }
              $out[$p] = $dot;
            }
            ${ev.value} = org.apache.spark.sql.catalyst.expressions
              .UnsafeArrayData.fromPrimitiveArray($out);
          }
        }
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProjectPlanes =
    copy(left = newLeft, right = newRight)
}

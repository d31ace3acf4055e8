package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** [[NearestCentroid]] with the centroid table carried as a BROADCAST
  * VARIABLE instead of an expression-tree literal — the mid-size tier of
  * the E-step kernel (r15 verdict: above ~1–4 MB a literal table is the
  * wrong transport — it is serialized into every task binary and printed
  * into every plan string, where a broadcast is fetched once per executor
  * and the plan carries only a handle).
  *
  * Same argmax, same equivalence contract: the scoring/selection loop is
  * [[NearestCentroid.bestOfTable]] verbatim (both tiers call the one
  * shared kernel), so literal-tier parity transfers; the spec pins the
  * tiers against each other end-to-end anyway. The table is broadcast by
  * [[graft.operators.Similarity]] AFTER its bounded collect — this
  * expression never evaluates the centroid plan itself.
  *
  * Not SQL-registered: a broadcast handle cannot ride a SQL literal, so
  * the only constructor is the Column builder in GraftFunctions. */
case class NearestCentroidBcast(child: Expression,
    table: Broadcast[(Array[Long], Array[Array[Double]])])
    extends UnaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (DoubleType | FloatType | LongType | IntegerType), _) =>
      Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(child.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double|float|long|int> vector, " +
          s"got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = true)))

  // null ONLY for an empty centroid table (callers short-circuit that
  // case before building the broadcast, but the kernel stays total)
  override def nullable: Boolean = true

  override def prettyName: String = "graft_nearest_centroid_bcast"

  @transient private lazy val leftElem: DataType = elemType(child.dataType).get

  /** Executor-side: one broadcast fetch per executor, then plain arrays. */
  def bestOf(v: ArrayData): InternalRow = {
    val t = table.value
    NearestCentroid.bestOfTable(t._1, t._2, v, leftElem)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    bestOf(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("nearestBcast", this,
      classOf[NearestCentroidBcast].getName)
    ev.copy(code = code"""
      ${childGen.code}
      InternalRow ${ev.value} = $self.bestOf(
        ${childGen.isNull} ? null :
          (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value});
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidBcast =
    copy(child = newChild)
}

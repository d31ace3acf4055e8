package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest centroid of a numeric-array vector
  * over a FOLDABLE centroid table — the fused per-row form of the
  * k-means / IVF E-step (`struct<centroid_id, ccos>` of the argmax-cosine
  * centroid, ties to the LOWEST centroid_id).
  *
  * The composed form this replaces — `crossJoin(broadcast(centroids))`
  * then `groupBy(vec_id).agg(max(struct(ccos, -centroid_id, ...)))` —
  * pays a full corpus exchange for the aggregate: vec_id is unique, so
  * map-side partial aggregation already collapses each vector's
  * numCentroids scored rows to one buffer, and the exchange that follows
  * moves EVERY (vec_id, embedding, score) row across the network solely
  * to satisfy a clustering requirement the data trivially meets. One
  * assignment pass at corpus scale shuffled the corpus once for nothing;
  * a Lloyd loop shuffled it once per round. This kernel computes the
  * same argmax inside the row's own task — zero exchange, one loop over
  * numCentroids × dim — and the centroid table rides the task binary as
  * a literal (bounded by [[graft.operators.Similarity]]'s inline cap;
  * larger centroid sets keep the aggregate form).
  *
  * Exact-equivalence contract with the composed plan, pinned in
  * NearestCentroidSpec:
  *  - per-centroid score = [[CosineSimilarity]]'s arithmetic verbatim:
  *    loop over min(|v|, |ce|) elements, the SAME left-to-right
  *    dot/norm/norm double accumulation with in-loop widening
  *    (float/long/int exact), denom == 0.0 → null score;
  *  - selection = Spark's `max(struct(ccos, -centroid_id))` ordering:
  *    doubles compare with `if (a == b) 0 else Double.compare(a, b)`
  *    (NaN greatest, -0.0 == 0.0), a null score loses to any non-null,
  *    an all-null row (null vector, zero vector) takes the LOWEST
  *    centroid_id with a null ccos — exactly what the aggregate's
  *    null-field struct ordering produced;
  *  - an EMPTY centroid table returns null (the composed crossJoin
  *    dropped every row; [[graft.operators.Similarity]] short-circuits
  *    that case before the kernel so the frames match).
  */
case class NearestCentroid(left: Expression, right: Expression)
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
        case ArrayType(StructType(Array(
          StructField(_, LongType, _, _),
          StructField(_, ArrayType(DoubleType, _), _, _))), _) => false
        case _ => true
      }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<struct<id: long, " +
          s"ce: array<double>>> centroid table, got " +
          right.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = true)))

  // null ONLY for an empty centroid table; a null/invalid vector still
  // yields a row (lowest id, null ccos), matching the aggregate form
  override def nullable: Boolean = true

  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val (ids: Array[Long], mat: Array[Array[Double]]) = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val n = arr.numElements()
    val is = new Array[Long](n)
    val ms = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      is(i) = row.getLong(0)
      ms(i) = row.getArray(1).toDoubleArray()
      i += 1
    }
    (is, ms)
  }

  @transient private lazy val leftElem: DataType = elemType(left.dataType).get

  /** The fused argmax — public to the generated code (invoked per row
    * from the codegen'd projection; the loop itself is JIT-compiled
    * Scala, so there is no interpreted expression tree on the hot
    * path). Returns null iff the centroid table is empty. The loop
    * itself lives on the companion ([[NearestCentroid.bestOfTable]]) so
    * the broadcast-tier twin ([[NearestCentroidBcast]]) runs the
    * IDENTICAL kernel. */
  def bestOf(v: ArrayData): InternalRow =
    NearestCentroid.bestOfTable(ids, mat, v, leftElem)

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    bestOf(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val self = ctx.addReferenceObj("nearest", this,
      classOf[NearestCentroid].getName)
    ev.copy(code = code"""
      ${leftGen.code}
      InternalRow ${ev.value} = $self.bestOf(
        ${leftGen.isNull} ? null :
          (org.apache.spark.sql.catalyst.util.ArrayData) ${leftGen.value});
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {

  @inline private def get(arr: ArrayData, et: DataType, i: Int): Double =
    et match {
      case DoubleType => arr.getDouble(i)
      case FloatType => arr.getFloat(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case other => throw new IllegalStateException(
        s"graft_nearest_centroid: unsupported element type $other")
    }

  /** max(struct(ccos, -id)) double semantics: SQL equality first (so
    * -0.0 == 0.0), then Double.compare (NaN greatest). */
  @inline private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** The one fused argmax loop BOTH transport tiers run — literal
    * ([[NearestCentroid]]) and broadcast ([[NearestCentroidBcast]]) —
    * so tier choice can never change a result. Semantics documented on
    * the class scaladoc; returns null iff the centroid table is empty. */
  private[functions] def bestOfTable(ids: Array[Long],
      mat: Array[Array[Double]], v: ArrayData, et: DataType): InternalRow = {
    if (ids.length == 0) return null
    var bestId = Long.MaxValue // lowest id among all-null scores
    var bestCos = 0.0
    var haveCos = false
    var c = 0
    while (c < ids.length) {
      val ce = mat(c)
      var score = 0.0
      var valid = false
      if (v != null) {
        val n = math.min(v.numElements(), ce.length)
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < n) {
          val xi = get(v, et, i); val yi = ce(i)
          dot += xi * yi; nx += xi * xi; ny += yi * yi
          i += 1
        }
        val denom = math.sqrt(nx) * math.sqrt(ny)
        if (denom != 0.0) { score = dot / denom; valid = true }
      }
      if (valid) {
        // non-null beats null; else higher score; tie → lower id
        if (!haveCos || cmp(score, bestCos) > 0 ||
            (cmp(score, bestCos) == 0 && ids(c) < bestId)) {
          haveCos = true; bestCos = score; bestId = ids(c)
        }
      } else if (!haveCos && ids(c) < bestId) {
        bestId = ids(c)
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestId,
      if (haveCos) java.lang.Double.valueOf(bestCos) else null))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ONE left-to-right merge pass of a single
  * BPE pair over a piece array — the training-loop step of
  * [[graft.operators.TextOps.bpeTrain]] (Sennrich et al. 2016: merge
  * ALL occurrences of the chosen pair left-to-right, continuing past
  * each merged pair).
  *
  * The higher-order `aggregate` fold this replaces is interpreted (HOFs
  * do not enter whole-stage codegen) and its accumulator rebuilds the
  * array per element (`concat(slice(acc, 1, n-1), array(m))` /
  * `concat(acc, array(p))`) — O(|pieces|²) array allocations per word
  * PER ROUND, paid by every word type in the vocabulary whether or not
  * it contains the pair. This kernel is one allocation-light pass; a
  * word without the pair returns its input array unchanged.
  *
  * Exact-equivalence contract with the fold (pinned in BpeMergeOnceSpec):
  * walk pieces left to right; if the output's last piece equals x and
  * the current piece equals y, replace the last piece with xy (and the
  * new xy, being strictly longer than x, can never seed an immediate
  * re-merge — the reference pass's continue-past-the-merge); else
  * append. A null piece never matches (the fold's null comparison falls
  * through to append); a null input array yields null.
  *
  * Aliasing constraint: the no-hit fast path returns the input ArrayData
  * BY REFERENCE. If the input is an UnsafeArrayData view over a reused
  * row buffer, a consumer that RETAINS the result across rows without
  * copying (collect_list, aggregation buffers) would see values alias.
  * The trainer's consumer (a projection followed by localCheckpoint)
  * copies every row, so this is safe there; route any buffer-retaining
  * consumer through a copy() first. */
case class BpeMergeOnce(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != ArrayType(StringType, true) &&
        left.dataType != ArrayType(StringType, false))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> piece column, got " +
          left.dataType.simpleString)
    else if (!right.foldable || (right.dataType match {
        case ArrayType(StringType, _) => false
        case _ => true
      }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<string> [x, y] pair, " +
          s"got ${right.dataType.simpleString}")
    else {
      // right is foldable, so the pair's SHAPE (exactly two non-null
      // elements) is checkable at analysis — a malformed call fails the
      // query plan instead of a task mid-job (the lazy val below keeps a
      // defensive require for callers that eval without analysis)
      val arr = right.eval().asInstanceOf[ArrayData]
      if (arr == null || arr.numElements() != 2)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName pair literal must be [x, y], got " +
            (if (arr == null) "null" else s"${arr.numElements()} elements"))
      else if (arr.isNullAt(0) || arr.isNullAt(1))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName pair elements must be non-null")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = left.nullable

  override def prettyName: String = "graft_bpe_merge_once"

  @transient private lazy val (x: UTF8String, y: UTF8String, xy: UTF8String) = {
    val arr = right.eval().asInstanceOf[ArrayData]
    require(arr.numElements() == 2,
      s"$prettyName pair literal must be [x, y], got ${arr.numElements()} elements")
    val xs = arr.getUTF8String(0)
    val ys = arr.getUTF8String(1)
    require(xs != null && ys != null, s"$prettyName pair must be non-null")
    (xs, ys, UTF8String.concat(xs, ys))
  }

  /** The fused pass — public to the generated code. */
  def mergeOnce(ps: ArrayData): ArrayData = {
    val n = ps.numElements()
    // fast path: scan for an adjacent (x, y) before allocating anything;
    // the overwhelming majority of word types do not contain the pair
    var i = 1
    var hit = false
    while (!hit && i < n) {
      val p = if (ps.isNullAt(i)) null else ps.getUTF8String(i)
      if (p != null && p.equals(y)) {
        val q = if (ps.isNullAt(i - 1)) null else ps.getUTF8String(i - 1)
        // NOTE: adjacency in the OUTPUT matters, not the input — but a
        // first input-adjacent hit is exactly where the fold's first
        // merge happens, and before the first merge output == input
        if (q != null && q.equals(x)) hit = true
      }
      i += 1
    }
    if (!hit) return ps
    val out = new Array[AnyRef](n)
    var len = 0
    var j = 0
    while (j < n) {
      val p = if (ps.isNullAt(j)) null else ps.getUTF8String(j)
      if (p != null && len > 0 && out(len - 1) != null &&
          out(len - 1).asInstanceOf[UTF8String].equals(x) && p.equals(y)) {
        out(len - 1) = xy
      } else {
        out(len) = p
        len += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, len))
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null else mergeOnce(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val self = ctx.addReferenceObj("bpeMergeOnce", this,
      classOf[BpeMergeOnce].getName)
    ev.copy(code = code"""
      ${leftGen.code}
      boolean ${ev.isNull} = ${leftGen.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $self.mergeOnce(${leftGen.value});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeMergeOnce =
    copy(left = newLeft, right = newRight)
}

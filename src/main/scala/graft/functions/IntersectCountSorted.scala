package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: |a ∩ b| for two SORTED DISTINCT
  * array<string> columns via a two-pointer merge walk — the allocation-free
  * successor to [[IntersectCount]] on the MinHash/containment verification
  * tails.
  *
  * [[IntersectCount]] builds a `java.util.HashSet` per ROW (one allocation
  * plus a hash+equals per element, per candidate pair — tens of millions of
  * pairs on a dense corpus). When both inputs are already sorted and
  * distinct, the same count falls out of a single merge walk: O(|a|+|b|)
  * binary comparisons, zero allocations, no hashing. The producer pays one
  * `sort_array` per DOC (corpus-sized) to save per-PAIR work
  * (candidate-sized, quadratic in cluster density) — the right trade
  * whenever pairs outnumber docs, which is the entire premise of the
  * verification joins.
  *
  * CONTRACT (caller-enforced, not checked): both arrays are sorted
  * ascending in Spark's StringType order (`sort_array` default) and
  * element-distinct (`collect_set` output), with no null elements. On
  * unsorted input the count silently under-reports — the only producers
  * are the `sort_array(collect_set(...))` builds in [[graft.operators.Dedup]],
  * and IntersectCountSpec pins agreement with [[IntersectCount]] on random
  * inputs through both eval paths.
  *
  * UTF8String.compare is byte-wise lexicographic — exactly the ordering
  * `sort_array` applies to StringType — so the walk's comparisons agree
  * with the producer's sort by construction.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "graft_intersect_count_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |int $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

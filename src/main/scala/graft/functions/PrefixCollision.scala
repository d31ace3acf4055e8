package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: does any position `j < len` hold
  * `a[j] == b[j]`? — the first-collision predicate of
  * [[graft.operators.Dedup.lshCandidatesFirstCollision]].
  *
  * Evaluated per JOINED ROW of the LSH band self-join (the near-quadratic
  * candidate stream — tens of millions of rows on a dense corpus), inside
  * the join stage. The naive column-algebra form
  * `exists(zip_with(slice(a), slice(b), _===_), identity)` is a chain of
  * higher-order functions: CodegenFallback, three array allocations per
  * row, and it demotes the whole join stage out of whole-stage codegen —
  * measured 3.2 s → 24.8 s on dedup_minhash_lsh at sf0.1, i.e. the fused
  * kernel is not an optimization but the difference between the
  * first-collision idea winning and losing. This form is one codegen'd
  * loop over at most `len` elements, zero allocation, early exit on the
  * first equal slot.
  *
  * Element types: `array<bigint>` (xxhash64 band hashes, production) and
  * `array<string>` (md5 band hashes, oracle-portable family). `len` is
  * clamped to both array lengths; null ELEMENTS never occur by the
  * producers' construction (band hashes of non-null slices) and compare
  * as non-equal if they ever did.
  */
case class PrefixCollision(left: Expression, right: Expression,
    len: Expression) extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = len

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) | ArrayType(StringType, _) => true
      case _ => false
    }) && left.dataType.asInstanceOf[ArrayType].elementType ==
      right.dataType.asInstanceOf[ArrayType].elementType
    if (arraysOk && len.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> or two array<string> " +
        s"inputs and an int length, got ${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}, ${len.dataType.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean =
    left.nullable || right.nullable || len.nullable

  override def prettyName: String = "graft_prefix_collision"

  override protected def nullSafeEval(a: Any, b: Any, l: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(l.asInstanceOf[Int],
      math.min(x.numElements(), y.numElements()))
    val longs = elemType == LongType
    var j = 0
    while (j < n) {
      val hit =
        if (x.isNullAt(j) || y.isNullAt(j)) false
        else if (longs) x.getLong(j) == y.getLong(j)
        else x.getUTF8String(j).equals(y.getUTF8String(j))
      if (hit) return java.lang.Boolean.TRUE
      j += 1
    }
    java.lang.Boolean.FALSE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, l) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val found = ctx.freshName("found")
      val cmp =
        if (elemType == LongType) s"$a.getLong($j) == $b.getLong($j)"
        else s"$a.getUTF8String($j).equals($b.getUTF8String($j))"
      s"""
         |int $n = $l;
         |if ($a.numElements() < $n) $n = $a.numElements();
         |if ($b.numElements() < $n) $n = $b.numElements();
         |boolean $found = false;
         |for (int $j = 0; $j < $n && !$found; $j++) {
         |  if (!$a.isNullAt($j) && !$b.isNullAt($j)) {
         |    $found = $cmp;
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PrefixCollision =
    copy(left = newFirst, right = newSecond, len = newThird)
}

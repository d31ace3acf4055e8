package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlInternals, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Filter => LFilter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, StatefulOpClusteredDistribution}

/** Native AS-OF join as a first-class operator: LogicalPlan + Strategy +
  * SparkPlan + optimizer Rule, injected via GraftExtensions — the (c)
  * path of the custom-operator ladder, used where composition costs more
  * than the operator deserves.
  *
  * Semantics: for each left row, the latest right row with equal key and
  * rightTime <= leftTime (inclusive); unmatched left rows keep nulls —
  * identical to [[graft.operators.Joins.asofJoin]] (spec-asserted) and to
  * DuckDB's ASOF LEFT JOIN.
  *
  * Physical shape: both sides hash-partition on the key and sort by
  * (key, time) — the same requirements a sort-merge join declares, so
  * EnsureRequirements plans the exchanges — then ONE streaming merge pass
  * per partition matches each left row against a single remembered right
  * row. Versus the union+window composition this avoids synthesizing
  * null-padded rows for the union and the window's last()-carry scan; at
  * 100 TB both shuffle once on the key, but the merge pass holds O(1)
  * state per key instead of materializing the unioned sort.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Push left-only filters below the as-of join (the join never drops or
  * duplicates left rows, so any predicate on left columns commutes). */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case LFilter(cond, aj @ AsofJoin(l, _, _, _, _, _))
        if cond.references.subsetOf(l.outputSet) =>
      aj.copy(left = LFilter(cond, l))
  }
}

/** Plans the logical node; everything else (exchanges, sorts) falls out of
  * the declared requirements. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // strict hash distribution with a pinned partition count (the streaming
  // stateful-op form): zipPartitions pairs partition i with partition i,
  // so AQE must NOT coalesce the two shuffles independently — plain
  // ClusteredDistribution would let it
  override def requiredChildDistribution: Seq[Distribution] =
    StatefulOpClusteredDistribution(Seq(leftKey), conf.numShufflePartitions) ::
      StatefulOpClusteredDistribution(Seq(rightKey), conf.numShufflePartitions) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size

    val attrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight: InternalRow = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // downstream operators (and the collect path) expect UnsafeRow
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(attrs, attrs)
      var matchKey: Any = null
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        // advance the right side through everything at-or-before (k, t);
        // remember the most recent row of key k seen
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val hk = rKey.eval(head)
          val cmpK = keyOrd.compare(hk, k)
          if (cmpK < 0) { rBuf.next() }
          else if (cmpK == 0 && timeOrd.compare(rTime.eval(head), t) <= 0) {
            matchKey = hk
            matchRow = rBuf.next().copy()
          } else advancing = false
        }
        val rhs =
          if (matchRow != null && keyOrd.compare(matchKey, k) == 0) matchRow
          else nullRight
        toUnsafe(joined(lRow, rhs))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinApi {

  /** Build the native as-of join over two DataFrames. Right columns come
    * back null-padded for unmatched left rows; key/time column names are
    * resolved on each side. */
  def asofJoinNative(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lPlan = GraftSqlInternals.analyzedPlan(left)
    val rPlan = GraftSqlInternals.analyzedPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name)}"))
    GraftSqlInternals.ofRows(spark,
      AsofJoin(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}

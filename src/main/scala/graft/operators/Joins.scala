package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators Spark lacks as built-ins, composed from existing ops
  * (preference (a) of the custom-operator ladder — the semantics are
  * expressible without a custom SparkPlan).
  */
object Joins {

  /** AS-OF join: for each left row, the latest right row with the same key
    * and `rightTime <= leftTime` (inclusive). Unmatched left rows survive
    * with nulls (left-outer semantics).
    *
    * Implemented as union + partitioned window scan rather than a range
    * join: both sides shuffle ONCE on the key, then a single ordered pass
    * per partition carries the most recent right values forward. At 100 TB
    * this is the shape that survives — a theta-join `l.t >= r.t` would
    * cross-product inside each key group, while this is O(n log n) in the
    * per-key row count with no intermediate blowup.
    *
    * Right rows sort before left rows at equal timestamps, so an exact
    * timestamp tie matches (ASOF >= semantics, as DuckDB's ASOF JOIN).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumns(rightCols.map(c => prefix + c -> lit(null)).toMap)
    val r = right
      .select(Seq(col(rightTime).as("_t"), col(key), lit(0).as("_side")) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
      .withColumns(leftCols.filterNot(_ == key)
        .map(c => c -> lit(null)).toMap)
    val unioned = l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_t", "_side")
  }

  /** Range-bounded aggregation join: for each left row, aggregate right
    * rows of the same key with `rightTime` in [leftTime - range, leftTime).
    * The equi-key bounds the blowup; the range predicate is evaluated
    * inside the hash-join's key group. */
  def rangeCount(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rangeSeconds: Long,
      leftId: String): DataFrame = {
    val lt = unix_micros(col(s"l.$leftTime"))
    val rt = unix_micros(col(s"r.$rightTime"))
    left.as("l")
      .join(right.as("r"),
        col(s"l.$key") === col(s"r.$key")
          && rt >= lt - lit(rangeSeconds * 1000000L)
          && rt < lt,
        "left")
      .groupBy(col(s"l.$leftId").as(leftId), col(s"l.$key").as(key))
      .agg(count(col(s"r.$rightTime")).as("n_in_range"))
  }
}

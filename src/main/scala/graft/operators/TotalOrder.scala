package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe total-order primitives: global row numbers and global
  * running sums WITHOUT the single-partition window collapse.
  *
  * `Window.orderBy(k)` with no partition spec moves the whole dataset to
  * one partition (Spark warns "No Partition Defined for Window
  * operation") — correct at toy scale, dead at 100 TB. The classic
  * two-pass partition-offset form used here produces identical output:
  *
  *  1. `repartitionByRange(orderKey)`: range partitions are globally
  *     ordered (every value in partition i sorts before every value in
  *     partition i+1), so a global order = partition order + order
  *     within the partition.
  *  2. Per-partition totals (count / sum of the weight) are aggregated to
  *     one row per partition — at most `spark.sql.shuffle.partitions`
  *     rows, i.e. metadata-sized at any data scale.
  *  3. Each partition's PREFIX offset (total over all lower partitions)
  *     comes from a triangular self-join over that tiny totals frame, and
  *     is broadcast back onto the data.
  *  4. The global value = prefix offset + an intra-partition window
  *     (hash-partitioned on the physical partition id — linear, parallel).
  *
  * The offsets are computed in-plan (no driver `collect`), and the
  * range-partitioned frame is MATERIALIZED ONCE (`.cache()`) so the totals
  * branch and the data branch read the same physical partitioning.
  * Correctness requires this: RangePartitioner draws its reservoir-sample
  * boundaries with a seed derived from the runtime RDD id, so two separate
  * range exchanges over the same input (which is what column pruning or an
  * AQE re-plan produces once exchange reuse fails to fire) can draw
  * DIFFERENT boundaries whenever the sampler actually subsamples — exactly
  * the regime this operator exists for. With one cached materialization
  * there is one boundary draw by construction; the cache is plan-shaped
  * like the minhash band-frame cache (cache, not localCheckpoint — see
  * Dedup.minhashNearDups) and bounded by the harness's per-query
  * `spark.catalog.clearCache()`; long-lived library callers should do the
  * same. A ScaleSpec property test additionally pins that the output is
  * invariant to the partition count itself.
  *
  * Determinism: `orderCol` must be a total order (unique per row) for the
  * running values to be well-defined — the same requirement the
  * single-partition form and any SQL `OVER (ORDER BY k)` oracle already
  * have under ties.
  */
object TotalOrder {

  /** Range-partition `df` on `orderCol` and attach the physical partition
    * id (`_pid`) plus that partition's prefix offset (`_prefix` = sum of
    * `weight` over all lower partitions). Internal: callers drop both. */
  private def withPrefixOffsets(df: DataFrame, orderCol: String,
      weight: Column): DataFrame = {
    // cache = the single physical materialization both branches read; see
    // the scaladoc above for why this is a correctness requirement, not an
    // optimization ([[CacheOnce]] keeps the call idempotent across gates
    // that share this canonical plan)
    val parted = CacheOnce(df.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id()))
    // one row per partition — bounded by spark.sql.shuffle.partitions
    val totals = parted.groupBy(col("_pid")).agg(sum(weight).as("_ptot"))
    // prefix sum over <= numPartitions rows: a triangular join on this
    // metadata-sized frame beats a window (which would itself be a
    // single-partition WindowExec and trip the gate-wide plan audit)
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._ptot")), lit(0L)).as("_prefix"))
    // true bounded broadcast: numPartitions rows regardless of data size
    parted.join(broadcast(offsets), Seq("_pid"))
  }

  /** Global `row_number() OVER (ORDER BY orderCol)` as `out` (LongType),
    * identical to the single-partition window on a unique key. */
  def globalRowNumber(df: DataFrame, orderCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
    withPrefixOffsets(df, orderCol, lit(1L))
      .withColumn(out, (col("_prefix") + row_number().over(w)).cast("long"))
      .drop("_pid", "_prefix")
  }

  /** Global running sum of `valueCol` over `orderCol` order as `out`.
    * `inclusive = true` is `ROWS UNBOUNDED PRECEDING AND CURRENT ROW`;
    * `false` is `... AND 1 PRECEDING` (0 for the first row). */
  def globalCumSum(df: DataFrame, orderCol: String, valueCol: String,
      out: String, inclusive: Boolean = true): DataFrame = {
    val upper = if (inclusive) 0L else -1L
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, upper)
    withPrefixOffsets(df, orderCol, col(valueCol))
      .withColumn(out,
        col("_prefix") + coalesce(sum(col(valueCol)).over(w), lit(0L)))
      .drop("_pid", "_prefix")
  }
}

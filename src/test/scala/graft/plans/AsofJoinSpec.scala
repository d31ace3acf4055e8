package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** The native AS-OF operator must agree exactly with the composed
  * union+window implementation, push left filters below itself, and plan
  * as one merge pass over hash-partitioned sorted children. */
class AsofJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sides = {
    val ev = graft.core.Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    (errors, clicks)
  }

  test("native == composed union+window implementation") {
    val (errors, clicks) = sides
    val native = AsofJoinApi.asofJoinNative(spark, errors, clicks,
        "user_id", "r_user", "ts", "r_ts")
      .select(col("event_id"), col("r_ts"), col("r_value"))
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.toString).orNull,
        if (r.isNullAt(2)) null else r.getDouble(2).toString)).toSet

    val composed = Joins.asofJoin(errors,
        clicks.withColumnsRenamed(Map("r_user" -> "user_id")),
        "user_id", "ts", "r_ts", Seq("r_value", "r_ts"))
      .select(col("event_id"), col("asof_r_ts"), col("asof_r_value"))
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.toString).orNull,
        if (r.isNullAt(2)) null else r.getDouble(2).toString)).toSet

    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("left-only filters are pushed below the join by the custom rule") {
    val (errors, clicks) = sides
    val filtered = AsofJoinApi.asofJoinNative(spark, errors, clicks,
        "user_id", "r_user", "ts", "r_ts")
      .filter(col("user_id") < 5)
    val optimized = filtered.queryExecution.optimizedPlan
    // after PushFilterThroughAsofJoin the top node is the AsofJoin itself
    // (the filter merged into the left scan), not a Filter over it
    assert(optimized.isInstanceOf[AsofJoin],
      "expected AsofJoin at the root after pushdown:\n" + optimized.toString)
    // and results match filtering after the join
    val after = AsofJoinApi.asofJoinNative(spark, errors, clicks,
        "user_id", "r_user", "ts", "r_ts")
      .collect().count(_.getLong(1) < 5)
    assert(filtered.count() === after.toLong)
  }

  test("plans as AsofJoinExec over sorted hash-partitioned children") {
    val (errors, clicks) = sides
    val df = AsofJoinApi.asofJoinNative(spark, errors, clicks,
      "user_id", "r_user", "ts", "r_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(1500)) // nodeName strips Exec
    assert(plan.contains("Exchange hashpartitioning(user_id")
      && plan.contains("Exchange hashpartitioning(r_user"), plan.take(2000))
    // the strict distribution must keep AQE from coalescing the two
    // shuffles out of lockstep
    assert(!plan.contains("AQEShuffleRead coalesced"), plan.take(2000))
  }

  test("ties at equal timestamps match (>= semantics, as DuckDB ASOF)") {
    import spark.implicits._
    val l = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.5))
      .toDF("r_user", "r_ts", "r_value")
    val out = AsofJoinApi.asofJoinNative(spark, l, r,
      "user_id", "r_user", "ts", "r_ts").collect()
    assert(out.length === 1 && out(0).getDouble(5) === 7.5)
  }
}

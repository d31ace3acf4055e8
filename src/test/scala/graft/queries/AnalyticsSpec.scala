package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-vs-exact checks for the analytics surface. */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per event_type") {
    val events = graft.core.Tables(spark, dir, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err < 0.05, s"$k: approx ${approx(k)} vs exact $n (err $err)")
    }
  }

  test("evt_distinct_users_approx gate query returns one row per type") {
    val q = graft.SparkEntry.allQueries
      .find(_.name == "evt_distinct_users_approx").get
    val rows = q.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
  }
}

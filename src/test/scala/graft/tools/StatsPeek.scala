package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dev-only A/B for the statistics story (run manually via testOnly with
  * GRAFT_PEEK=1): does ANALYZE-backed catalog stats + the cost-based
  * estimator price q03's build side correctly WITHOUT the per-query
  * SHUFFLE_HASH hint? The r9 finding (BENCH_NOTES): with file-size
  * pricing the static planner broadcast-collected the 490k-row filtered
  * lineitem side through the driver. */
class StatsPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def q03NoHint(): org.apache.spark.sql.DataFrame = {
    val c = graft.core.Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = graft.core.Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
    val l = graft.core.Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    l.join(o.join(c, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def lineitemBroadcasts(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def strip(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          strip(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          strip(q.plan)
        case other => other +: other.children.flatMap(strip)
      }
    strip(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if b.child.toString.contains("lineitem") => b
    }.size
  }

  test("stats visible + q03 no-hint plan under ANALYZE/CBO") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    info("=== BEFORE analyze (path mode, CBO off): no-hint q03 plan ===")
    val before = q03NoHint()
    info("lineitem-side broadcasts BEFORE: " + lineitemBroadcasts(before))

    graft.core.Tables.analyzeDir(spark, dir)
    val li = graft.core.Tables(spark, dir, "lineitem")
    val stats = li.queryExecution.optimizedPlan.stats
    info(s"lineitem stats: sizeInBytes=${stats.sizeInBytes} rowCount=${stats.rowCount}")

    for (cbo <- Seq("false", "true")) {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      val after = q03NoHint()
      val n = lineitemBroadcasts(after)
      info(s"ANALYZE mode, cbo=$cbo: lineitem-side broadcasts = $n")
      info(after.queryExecution.executedPlan.toString.take(2500))
    }
    spark.conf.set("spark.sql.cbo.enabled", "false")
    graft.core.Tables.resetAnalyzed(spark)
  }
}

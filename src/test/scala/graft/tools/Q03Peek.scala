package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for q03_unshipped_revenue (run manually via
  * testOnly with GRAFT_PEEK=1). Hypothesis under test: the testdata's
  * timestamp columns are TIMESTAMP(MICROS) isAdjustedToUTC=false →
  * TIMESTAMP_NTZ in Spark, and comparing them against a session-TZ
  * `cast("timestamp")` literal wraps the column in a cast that blocks
  * parquet predicate pushdown (the same defect class eventsAfter fixes
  * for the events table). */
class Q03Peek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save() // warm
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    info(f"$label: min ${times.min}%.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
  }

  test("q03 schema + pushdown check") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val l = graft.core.Tables(spark, dir, "lineitem")
    info("l_shipdate type: " + l.schema("l_shipdate").dataType)
    val o = graft.core.Tables(spark, dir, "orders")
    info("o_orderdate type: " + o.schema("o_orderdate").dataType)

    // current form: session-TZ literal
    val cur = l.filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      .select("l_orderkey")
    cur.collect()
    info("CURRENT filter plan:\n" +
      cur.queryExecution.executedPlan.toString.take(1800))

    // NTZ literal form
    val ntz = lit(java.time.LocalDateTime.of(1996, 3, 15, 0, 0))
    val fixed = l.filter(col("l_shipdate") > ntz).select("l_orderkey")
    fixed.collect()
    info("NTZ filter plan:\n" +
      fixed.queryExecution.executedPlan.toString.take(1800))
  }

  test("q03 full-query timing + final plan") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val q = graft.SparkEntry.allQueries.find(_.name == "q03_unshipped_revenue").get
    val df = q.run(spark, dir)
    time("q03 current")(df)
    df.collect()
    info("q03 executed plan:\n" + df.queryExecution.executedPlan.toString.take(4000))
  }

  private def q03variant(mode: String): org.apache.spark.sql.DataFrame = {
    val c = graft.core.Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = graft.core.Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
    val l = graft.core.Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    val oc = o.join(c, col("o_custkey") === col("c_custkey"))
    val joined = mode match {
      case "current" => l.join(oc, col("l_orderkey") === col("o_orderkey"))
      case "merge_l" => l.hint("merge").join(oc, col("l_orderkey") === col("o_orderkey"))
      case "shj_oc"  => l.join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
    }
    joined
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  test("q03 stage bisection") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val c = graft.core.Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = graft.core.Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
    val l = graft.core.Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    info(s"rows: l=${l.count()} o=${o.count()} c=${c.count()}")
    time("lineitem scan+filter (4 cols)")(
      l.select("l_orderkey", "l_extendedprice", "l_discount"))
    val oc = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    info(s"oc rows: ${oc.count()}")
    time("oc join only")(oc)
    val j = l.join(oc, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_extendedprice", "l_discount", "o_orderdate", "o_orderpriority")
    time("l join oc (no agg)")(j)
    val agg = j
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    info(s"agg rows: ${agg.count()}")
    time("join + agg (no sort)")(agg)
  }

  test("q03 variants") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    for (m <- Seq("current", "merge_l", "shj_oc")) {
      val df = q03variant(m)
      time(s"q03 $m")(df)
    }
    // what does the 10 MB default threshold do (static + adaptive)?
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "10m"))
    try {
      val df = q03variant("current")
      time("q03 current @10m threshold")(df)
      df.collect()
      info("q03 @10m plan:\n" + df.queryExecution.executedPlan.toString.take(3000))
      // proposed bench conf: static stays at the 10 MB default (file-size
      // estimates must not justify big broadcasts), adaptive at 64 MB
      // (runtime-measured sizes may)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      val df2 = q03variant("current")
      time("q03 current @static10m/adaptive64m")(df2)
      df2.collect()
      info("q03 @split plan:\n" + df2.queryExecution.executedPlan.toString.take(3000))
      // fully runtime-driven: static broadcasts off, AQE decides from
      // measured stage sizes only
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      val df3 = q03variant("current")
      time("q03 current @staticOFF/adaptive64m")(df3)
      df3.collect()
      info("q03 @staticOFF plan:\n" + df3.queryExecution.executedPlan.toString.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    val dfm = q03variant("merge_l")
    dfm.collect()
    info("q03 merge_l plan:\n" + dfm.queryExecution.executedPlan.toString.take(3000))
  }
}

package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dev-only plan/stage peek for q04_revenue_by_nation (GRAFT_PEEK=1). */
class Q04Peek extends SparkSpec {

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

  test("q04 plan + variants") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val q = graft.SparkEntry.allQueries.find(_.name == "q04_revenue_by_nation").get
    val df = q.run(spark, dir)
    time("q04 current")(df)
    df.collect()
    info("q04 plan:\n" + df.queryExecution.executedPlan.toString.take(3500))

    // variant: SHUFFLE_HASH on orders side of the lineitem join
    def t2(n: String) = graft.core.Tables(spark, dir, n)
    val geo = t2("customer")
      .join(broadcast(t2("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t2("region")), col("n_regionkey") === col("r_regionkey"))
    val v = t2("lineitem")
      .join(t2("orders").hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(geo.select("c_custkey", "n_name", "r_name").hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("r_name"), col("n_name"))
    time("q04 shj hints")(v)
  }
}

package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.TotalOrder

/** Dev-only bisection for etl_surrogate_keys (GRAFT_PEEK=1). */
class SurrogatePeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def time(label: String)(thunk: => Long): Unit = {
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      TotalOrder.invalidateBoundaryMemo(spark)
      val t0 = System.nanoTime()
      val n = thunk
      ((System.nanoTime() - t0) / 1e9, n)
    }
    info(f"$label: min ${times.map(_._1).min}%.3f s  rows=${times.head._2}  (${times.map(t => f"${t._1}%.3f").mkString(", ")})")
  }

  test("surrogate keys bisection") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    def base() = graft.core.Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    time("A scan") { base().count() }
    TotalOrder.persistBoundaries(base(), "o_orderkey")
    time("B rn unbounded") {
      TotalOrder.globalRowNumber(base(), "o_orderkey", "order_sk")
        .orderBy("order_sk").limit(100).count()
    }
    time("C rn bounded") {
      TotalOrder.globalRowNumber(base(), "o_orderkey", "order_sk", Some(100L))
        .orderBy("order_sk").limit(100).count()
    }
    // where does bounded time go? plan print
    val df = TotalOrder.globalRowNumber(base(), "o_orderkey", "order_sk", Some(100L))
      .orderBy("order_sk").limit(100)
    df.count()
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("Window") || l.contains("Subquery") || l.contains("Aggregate"))
      .foreach(l => info(l.take(150)))
  }
}

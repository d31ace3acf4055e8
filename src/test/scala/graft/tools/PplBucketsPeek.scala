package graft.tools

import graft.SparkSpec
import graft.operators.{TextOps, TotalOrder}
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for txt_ppl_buckets (run manually via
  * testOnly with GRAFT_PEEK=1): the gate measured 2.9 s at sf0.1 on
  * arrival — decomposes into the LM scorer, the rank, and the ntile
  * tail so the wall time can be attributed before choosing a cut.
  * r12 shape: no score cache; rank-key boundaries persisted and read
  * in-plan, one lmScore execution through the shared slim exchange. */
class PplBucketsPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def docs() = graft.core.Tables(spark, dir, "documents")

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

  private def keyed() = {
    val scored = TextOps.lmScore(docs(), "doc_id", "text")
    val scaledRaw = round(-col("lm_score") * 10000).cast("long")
    val scaled = when(col("lm_score").isNull, lit(1000000L))
      .otherwise(scaledRaw)
    scored.withColumn("_k", scaled * lit(1L << 40) + col("doc_id"))
  }

  test("ppl_buckets: stage budget at gate scope") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))

    time("A lmScore")(TextOps.lmScore(docs(), "doc_id", "text").count())

    TotalOrder.persistBoundaries(keyed(), "_k")
    time("B rank in-plan boundaries") {
      TotalOrder.globalRowNumber(keyed(), "_k", "_rank").count()
    }

    time("C nDocs agg") {
      docs().agg(count_distinct(col("doc_id")).as("n")).collect()(0).getLong(0)
    }

    time("D full pplBuckets")(
      TextOps.pplBuckets(docs(), "doc_id", "text", 3).count())

    val df = TotalOrder.globalRowNumber(keyed(), "_k", "_rank")
    df.collect() // executes df's OWN queryExecution (count() builds another)
    val plan = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/ppl_rank_plan.txt"), plan)
    info(s"rank plan written: ${plan.length} chars")
  }
}

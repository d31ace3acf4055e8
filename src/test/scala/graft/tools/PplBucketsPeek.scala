package graft.tools

import graft.SparkSpec
import graft.operators.{CacheOnce, TextOps, TotalOrder}
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for txt_ppl_buckets (run manually via
  * testOnly with GRAFT_PEEK=1): the gate measured 2.9 s at sf0.1 on
  * arrival — decomposes into the LM scorer, the cache materialization,
  * the TotalOrder rank, and the ntile tail so the wall time can be
  * attributed before choosing a cut. */
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

  test("ppl_buckets: stage budget at gate scope") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))

    time("A lmScore")(TextOps.lmScore(docs(), "doc_id", "text").count())

    time("B lmScore cached + count") {
      val s = CacheOnce(TextOps.lmScore(docs(), "doc_id", "text"))
      s.count()
    }

    time("C cached + rank") {
      val s = CacheOnce(TextOps.lmScore(docs(), "doc_id", "text"))
      val scaled = when(col("lm_score").isNull, lit(1000000L))
        .otherwise(round(-col("lm_score") * 10000).cast("long"))
      val key = scaled * lit(1L << 40) + col("doc_id")
      TotalOrder.globalRowNumber(s.withColumn("_k", key), "_k", "_rank")
        .count()
    }

    time("D full pplBuckets")(
      TextOps.pplBuckets(docs(), "doc_id", "text", 3).count())
  }
}

package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: dispatcher overhead vs direct min-label on the gate graph. */
class ComponentsPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def time(label: String)(body: => Unit): Unit = {
    body // warm
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    info(f"$label: min ${times.min}%.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
  }

  test("components dispatcher overhead") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val docs = graft.core.Tables(spark, dir, "documents").filter(col("doc_id") < 200)
    def pairs = Dedup.jaccardPairs(Dedup.tokenSet(docs, "doc_id", "text"), 0.8)
    time("min-label direct") {
      Dedup.connectedComponentsMinLabel(pairs).count(); spark.catalog.clearCache()
    }
    time("dispatcher") {
      Dedup.connectedComponents(pairs).count(); spark.catalog.clearCache()
    }
  }
}

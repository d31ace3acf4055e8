package graft.tools

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for dedup_minhash_lsh (GRAFT_PEEK=1) —
  * VERDICT r10 item #5: with the candidate distinct deleted, profile
  * what remains of the #1 query. */
class LshPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def docs() = graft.core.Tables(spark, dir, "documents")


  private def time(label: String)(thunk: => Long): Unit = {
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = thunk
      ((System.nanoTime() - t0) / 1e9, n)
    }
    info(f"$label: min ${times.map(_._1).min}%.3f s  rows=${times.head._2}  (${times.map(t => f"${t._1}%.3f").mkString(", ")})")
  }

  test("minhash lsh: stage budget at gate scope") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val numHashes = 64
    val bands = 16
    val threshold = 0.8

    def sets() = Dedup.tokenSet(docs(), "doc_id", "text")
    time("A sets") { sets().count() }

    def sigs() = Dedup.minhashSignaturesAgg(sets(), numHashes)
    time("B signatures") { sigs().count() }

    def bandsDf() = Dedup.lshBandsFromSig(sigs(), numHashes, bands, carryAll = true)
    time("C bands") { bandsDf().count() }

    time("D candidates (first-collision join)") {
      val b = graft.operators.CacheOnce(bandsDf())
      Dedup.lshCandidatesFirstCollision(b, threshold).count()
    }

    time("E tokArr (sorted distinct arrays)") {
      sets().groupBy("doc_id")
        .agg(sort_array(collect_set(col("w"))).as("toks")).count()
    }

    time("F full pipeline") {
      Dedup.minhashNearDups(docs(), "doc_id", "text",
        numHashes, bands, threshold).count()
    }
  }
}

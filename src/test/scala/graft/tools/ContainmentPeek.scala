package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage bisection for dedup_containment_prefix (run manually
  * via testOnly with GRAFT_PEEK=1) — the one weak-set member without a
  * committed stage profile (VERDICT r9). Decomposes the prefix-filter
  * pipeline into its materialization stages and times each on the gate's
  * scope, so the wall time can be attributed to data-shaped work vs
  * per-stage scheduling constants. */
class ContainmentPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def time(label: String)(thunk: => Long): Unit = {
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = thunk
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, n)
    }
    info(f"$label: min ${times.map(_._1).min}%.3f s  rows=${times.head._2}  (${times.map(t => f"${t._1}%.3f").mkString(", ")})")
  }

  test("containment prefix: stage budget at gate scope") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val threshold = 0.8
    def setsRaw() = graft.operators.Dedup.tokenSet(
      graft.core.Tables(spark, dir, "documents").filter(col("doc_id") < 250),
      "doc_id", "text")

    // A. token frame materialization (the CacheOnce the real op pays once)
    time("A toks materialize+count") { setsRaw().count() }

    // B/C/D/E: rebuild the pipeline with explicit stage boundaries
    def cached() = {
      val t = setsRaw().cache(); t.count(); t
    }
    val toks = cached()
    locally {
      val t0 = System.nanoTime()
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val nSizes = sizes.count()
      val docFreq = toks.groupBy("w").agg(count(lit(1)).as("tok_df"))
      val nDf = docFreq.count()
      info(f"B sizes+docFreq (cached input): ${(System.nanoTime() - t0) / 1e9}%.3f s sizes=$nSizes df=$nDf")

      val full = toks.join(sizes, Seq("doc_id"))
      val prefixes = full.join(docFreq, Seq("w"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tok_df"), col("w"))))
        .filter(col("rnk") <=
          col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + lit(1))
      val t1 = System.nanoTime()
      val nPref = prefixes.count()
      info(f"C prefixes: ${(System.nanoTime() - t1) / 1e9}%.3f s rows=$nPref")

      val candsRaw = prefixes.as("a")
        .join(full.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("id"), col("b.doc_id").as("other"),
          col("a.n").as("n_id"), col("b.n").as("n_other"))
      val t2 = System.nanoTime()
      val nRaw = candsRaw.count()
      info(f"D cand join (pre-distinct): ${(System.nanoTime() - t2) / 1e9}%.3f s rows=$nRaw")

      val t3 = System.nanoTime()
      val nDist = candsRaw.distinct().count()
      info(f"E cand distinct: ${(System.nanoTime() - t3) / 1e9}%.3f s rows=$nDist (dup factor ${nRaw.toDouble / nDist}%.2f)")

      val t4 = System.nanoTime()
      val tokArr = toks.groupBy("doc_id")
        .agg(sort_array(collect_set(col("w"))).as("toks"))
      val nArr = tokArr.count()
      info(f"F tokArr: ${(System.nanoTime() - t4) / 1e9}%.3f s rows=$nArr")
      toks.unpersist()
    }

    // G. the full gate as shipped
    val q = graft.SparkEntry.allQueries.find(_.name == "dedup_containment_prefix").get
    time("G full gate") { q.run(spark, dir).count() }
  }
}

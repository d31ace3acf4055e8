package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextOps}

/** Dev-only stage bisection for smp_token_budget_subword (GRAFT_PEEK=1). */
class SubwordBudgetPeek extends SparkSpec {
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

  test("subword budget bisection") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables(spark, dir, "documents")
    val toks = TextOps.tokens(col("text"))
    val nSub = size(flatten(transform(toks, w =>
      graft.functions.GraftFunctions.subwordTokenize(
        w, TextOps.demoSubwordVocab)))).cast("long")
    val base = docs.select(col("doc_id"), nSub.as("n_toks"))
    time("kernel count projection (1 pass)")(base)
    // count without materializing pieces: sum of per-word piece counts
    val nSub2 = aggregate(transform(toks, w =>
      size(graft.functions.GraftFunctions.subwordTokenize(
        w, TextOps.demoSubwordVocab))), lit(0), (acc, x) => acc + x).cast("long")
    val base2 = docs.select(col("doc_id"), nSub2.as("n_toks"))
    time("kernel count via aggregate (1 pass)")(base2)
    val nSub3 = graft.functions.GraftFunctions.subwordCount(
      toks, TextOps.demoSubwordVocab)
    val base3 = docs.select(col("doc_id"), nSub3.as("n_toks"))
    time("fused SubwordCount (1 pass)")(base3)
    graft.operators.TotalOrder.persistBoundaries(base3, "doc_id")
    time("full budget (fused count)")(
      Sampling.tokenBudget(base3, "doc_id", "n_toks", 12000L))
    graft.operators.TotalOrder.persistBoundaries(base, "doc_id")
    time("full budget (current)")(
      Sampling.tokenBudget(base, "doc_id", "n_toks", 12000L))
    val whitebase = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_toks"))
    graft.operators.TotalOrder.persistBoundaries(whitebase, "doc_id")
    time("whitespace budget (reference)")(
      Sampling.tokenBudget(whitebase, "doc_id", "n_toks", 5000L))
  }
}

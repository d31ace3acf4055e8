package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextOps, TotalOrder}

/** Dev-only stage bisection for smp_token_budget (GRAFT_PEEK=1). */
class TokenBudgetPeek extends SparkSpec {

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

  test("token budget bisection") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val docs = graft.core.Tables(spark, dir, "documents")
    val proj = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_toks"))
    time("tokenize projection (1 pass)")(proj)
    val projFast = docs.select(col("doc_id"),
      (regexp_count(trim(col("text")), lit("\\s+")) + 1).cast("long").as("n_toks"))
    time("regexp_count projection (1 pass)")(projFast)
    time("full tokenBudget (current)")(
      Sampling.tokenBudget(proj, "doc_id", "n_toks", 5000L))
    time("full tokenBudget (regexp_count)")(
      Sampling.tokenBudget(projFast, "doc_id", "n_toks", 5000L))
    // cum sum over a pre-counted long column only (no tokenize at all)
    val pre = proj.collect()
    import spark.implicits._
    val preDf = pre.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("doc_id", "n_toks").repartition(32)
    time("cumsum only (local pre-tokenized input)")(
      TotalOrder.globalCumSum(preDf, "doc_id", "n_toks", "cum_tokens")
        .filter(col("cum_tokens") <= 5000L))
  }

  test("token budget cold-path tiers (sketch vs persisted vs memo)") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val docs = graft.core.Tables(spark, dir, "documents")
    val proj = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_toks"))
    def full() = Sampling.tokenBudget(proj, "doc_id", "n_toks", 5000L)
    def timeCold(label: String)(prep: () => Unit): Unit = {
      full().write.format("noop").mode("overwrite").save() // JIT warm
      val times = (1 to 3).map { _ =>
        prep()
        val t0 = System.nanoTime()
        full().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      info(f"$label: min ${times.min}%.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    // drop any persisted boundary tables so tier 1 really sketches
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_boundaries_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    timeCold("tier1 cold sketch (no memo, no table)") { () =>
      TotalOrder.invalidateBoundaryMemo(spark)
    }
    TotalOrder.persistBoundaries(proj, "doc_id")
    timeCold("tier2 persisted table (memo invalidated)") { () =>
      TotalOrder.invalidateBoundaryMemo(spark)
    }
    timeCold("tier3 session memo") { () => () }
  }
}

package graft.tools

import graft.SparkSpec
import graft.operators.{Sampling, TextOps}
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for smp_dsir (GRAFT_PEEK=1): attributes the
  * gate's wall time between the gram explode, the md5 bucket hashing,
  * the marginal aggregate, and the rescore join. */
class DsirPeek extends SparkSpec {

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

  private def gramStream() = docs()
    .select(col("doc_id"), (col("source") === "src0").as("is_tgt"),
      TextOps.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= 1)
    .select(col("doc_id"), col("is_tgt"), explode(concat(
      col("toks"),
      when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - lit(1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(2)))))
        .otherwise(array()))).as("w"))

  test("dsir: stage budget") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    graft.functions.GraftFunctions.register(spark)
    time("A composed gram explode")(gramStream().count())
    time("B composed + md5 hash")(gramStream()
      .select(pmod(Sampling.hash60(col("w")), lit(256L)).as("b")).count())
    time("C composed + marginal agg")(gramStream()
      .select(col("is_tgt"), pmod(Sampling.hash60(col("w")), lit(256L)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("raw_n")).count())
    time("C' fused + marginal agg")(docs()
      .select((col("source") === "src0").as("is_tgt"),
        graft.functions.GraftFunctions.gramBuckets(
          split(trim(col("text")), "\\s+"), 256).as("bs"))
      .select(col("is_tgt"), explode(col("bs")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("raw_n")).count())
    time("D full dsirWeights")(
      Sampling.dsirWeights(docs(), "doc_id", "text",
        col("source") === "src0", 256).count())
  }
}

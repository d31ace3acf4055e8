package graft.tools

import graft.SparkSpec
import graft.operators.{Dedup, Sampling, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for the winnowing pair (run manually via
  * testOnly with GRAFT_PEEK=1) — VERDICT r10 item #1: txt_winnowing +
  * txt_winnow_overlap are the largest data-shaped block at x1 with no
  * committed stage profile. Decomposes the pipeline into gram
  * generation (hash60 digests), the w-fold window explode, the
  * per-window argmin aggregation, the trailing distinct, and the
  * overlap gate's df-cut + self-join — so the wall time can be
  * attributed before choosing a cut. */
class WinnowPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")
  private val k = 3
  private val w = 4

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

  /** The gram frame exactly as TextOps.winnow builds it. */
  private def grams(): DataFrame =
    docs().repartition(col("doc_id"))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        greatest(size(col("t")) - (k - 1), lit(1)).cast("long").as("n_grams"),
        explode(transform(
          sequence(lit(1), greatest(size(col("t")) - (k - 1), lit(1))),
          i => struct(i.as("pos"), slice(col("t"), i, lit(k)).as("g")))).as("s"))
      .filter(size(col("s.g")) === k)
      .select(col("doc_id"), col("s.pos").cast("long").as("pos"),
        greatest(col("n_grams") - (w - 1), lit(1L)).as("last_win"),
        Sampling.hash60(concat_ws(" ", col("s.g"))).as("h"))

  test("winnow: stage budget at gate scope") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))

    // A. raw corpus scan + byDoc exchange only
    time("A byDoc+tokens") {
      docs().repartition(col("doc_id"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .select(col("doc_id"), size(col("t")).as("n")).count()
    }

    // B. + gram explode WITHOUT the hash (isolates explode vs md5 cost)
    time("B grams no-hash") {
      docs().repartition(col("doc_id"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(1), greatest(size(col("t")) - (k - 1), lit(1))),
            i => struct(i.as("pos"), slice(col("t"), i, lit(k)).as("g")))).as("s"))
        .filter(size(col("s.g")) === k).count()
    }

    // C. + hash60 per gram (the md5 digests)
    time("C grams+hash60") { grams().count() }

    // D. + w-fold window explode (row count shows the multiplication)
    time("D window explode") {
      grams().withColumn("win", explode(sequence(
        greatest(col("pos") - (w - 1), lit(1L)),
        least(col("pos"), col("last_win"))))).count()
    }

    // E. + argmin agg (the (doc_id, win) exchange)
    time("E argmin agg") {
      grams().withColumn("win", explode(sequence(
        greatest(col("pos") - (w - 1), lit(1L)),
        least(col("pos"), col("last_win")))))
        .groupBy(col("doc_id"), col("win"))
        .agg(min(struct(col("h"), (-col("pos")).as("np"))).as("m"))
        .count()
    }

    // F. full winnow incl. trailing distinct
    time("F winnow full") {
      TextOps.winnow(docs(), "doc_id", "text", k, w).count()
    }

    // G. array-algebra alternative: per-doc slice+array_min, no window
    // explode, no (doc_id, win) exchange, no distinct exchange
    time("G array-form") {
      docs().repartition(col("doc_id"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          transform(
            sequence(lit(1), greatest(size(col("t")) - (k - 1), lit(1))),
            i => struct(
              Sampling.hash60(concat_ws(" ", slice(col("t"), i, lit(k)))).as("h"),
              (-i.cast("long")).as("np"))).as("hs"))
        .select(col("doc_id"),
          explode(array_distinct(transform(
            sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
            win => array_min(slice(col("hs"), win, lit(w)))))).as("m"))
        .select(col("doc_id"), (-col("m.np")).as("pos"), col("m.h").as("fp"))
        .count()
    }
  }

  test("winnow: executed plan exchanges") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val df = TextOps.winnow(docs(), "doc_id", "text", k, w)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    info("exchanges: " + "Exchange [a-z]+".r.findAllIn(plan).mkString(" | "))
    info("aggregates: " + "[A-Za-z]*HashAggregate".r.findAllIn(plan).toSeq.distinct.mkString(" | "))
    plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("HashAggregate") ||
      l.contains("Generate") || l.contains("Sort")).foreach(l => info(l.take(160)))
  }

  test("winnow overlap: stage budget at gate scope") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))

    // H. fps frame (winnow + project/distinct) — the cached input
    time("H fps distinct") {
      TextOps.winnow(docs(), "doc_id", "text", k, w)
        .select(col("doc_id"), col("fp")).distinct().count()
    }

    // I. full overlap gate
    time("I overlap full") {
      TextOps.winnowOverlap(docs(), "doc_id", "text", k, w,
        minShared = 3L, maxDf = 50L).count()
    }
  }
}

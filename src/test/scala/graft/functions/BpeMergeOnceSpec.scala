package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BpeMergeOnce]] — the fused bpeTrain round step. The load-bearing
  * test is VALUE PARITY with the interpreted `aggregate` fold it
  * replaced (merge all occurrences of (x, y) left-to-right, continuing
  * past each merged pair): txt_bpe_train's oracle replays the fold's
  * semantics round by round, so the kernel must reproduce them on every
  * shape — repeated-pair runs, back-to-back merges, null pieces — or
  * the learned table's hash moves. */
class BpeMergeOnceSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** The former fold, verbatim from the shipped trainer. */
  private def foldMerge(df: DataFrame, x: String, y: String): DataFrame =
    df.withColumn("out", aggregate(col("ps"),
      array().cast("array<string>"),
      (acc, p) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(x) && p === lit(y),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(x + y))))
        .otherwise(concat(acc, array(p)))))

  private def kernelMerge(df: DataFrame, x: String, y: String): DataFrame =
    df.withColumn("out", GraftFunctions.bpeMergeOnce(col("ps"), x, y))

  private def collectOut(df: DataFrame): Seq[Seq[String]] =
    df.orderBy("id").collect().map(r => r.getSeq[String](r.fieldIndex("out")))

  test("parity with the fold on adversarial shapes") {
    import spark.implicits._
    val shapes: Seq[Seq[String]] = Seq(
      Seq("a", "a", "a", "a", "a"), // 5-run under (a,a): |aa|aa|a|
      Seq("a", "a", "a", "a", "a", "a"), // 6-run: |aa|aa|aa|
      Seq("s", "o", "o", "o", "o", "o"), // the ADVICE 'sooooo' shape
      Seq("a", "b", "a", "b"), // alternation under (a,b)
      Seq("x", "y"), Seq("y", "x"), Seq("x"), Seq(),
      Seq("a", "b", "b", "a", "b"), // (b,b) inside (a,b) context
      Seq("q", "r", "s")) // pair absent: fast path must return input
    val df = shapes.zipWithIndex.map { case (ps, i) => (i.toLong, ps) }
      .toDF("id", "ps")
    for ((x, y) <- Seq(("a", "a"), ("a", "b"), ("o", "o"), ("x", "y"),
        ("b", "b"), ("zz", "zz"))) {
      val k = collectOut(kernelMerge(df, x, y))
      val f = collectOut(foldMerge(df, x, y))
      assert(k === f, s"diverges for pair ($x, $y)")
    }
  }

  test("parity on randomized piece arrays over a small alphabet") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val alpha = Seq("a", "b", "ab", "c")
    val df = (0 until 400).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(12))(alpha(rng.nextInt(alpha.size))))
    }.toDF("id", "ps")
    for ((x, y) <- Seq(("a", "b"), ("b", "a"), ("ab", "c"), ("a", "a"))) {
      assert(collectOut(kernelMerge(df, x, y))
        === collectOut(foldMerge(df, x, y)), s"pair ($x, $y)")
    }
  }

  test("null algebra: null pieces never match; null array stays null") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Seq(Some("a"), None, Some("a"), Some("b")))),
      (1L, Option.empty[Seq[Option[String]]]))
      .toDF("id", "ps")
    val k = kernelMerge(df, "a", "b").orderBy("id").collect()
    val f = foldMerge(df, "a", "b").orderBy("id").collect()
    val idx = k(0).fieldIndex("out")
    assert(k(0).getSeq[String](idx) === f(0).getSeq[String](idx))
    assert(k(1).isNullAt(idx) && f(1).isNullAt(idx))
  }

  test("trainer end-to-end: learned table identical through the kernel") {
    // bpeTrain now routes through the kernel; compare against a local
    // reference trainer over the same corpus slice
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 120)
    val got = graft.operators.TextOps
      .bpeTrain(docs, "text", wordRe = "[a-z]{1,12}", steps = 4)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    // independent in-memory Sennrich reference
    val words = docs.select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
      .filter(_.matches("[a-z]{1,12}"))
    var vocab: Map[Seq[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toSeq -> ws.length.toLong }
    val want = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    for (step <- 1 to 4) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (ps, f) =>
        ps.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((x, y), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        want += ((step.toLong, x, y, cnt))
        vocab = vocab.toSeq.map { case (ps, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          ps.foreach { p =>
            if (out.nonEmpty && out.last == x && p == y)
              out(out.length - 1) = x + y
            else out += p
          }
          (out.toSeq, f)
        }.groupBy(_._1).map { case (ps, fs) => ps -> fs.map(_._2).sum }
      }
    }
    assert(got.toSeq === want.toSeq)
  }
}

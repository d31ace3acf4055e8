package graft.streaming

import graft.SparkSpec
import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Streaming Count-Min semantics: cross-trigger additivity, replayed
  * -batch idempotence (the guard the non-idempotent sum NEEDS, unlike
  * Bloom's OR), compaction neutrality, and corpus seeding — all through
  * the exact production trigger body. */
class CmsStreamSpec extends SparkSpec {

  private val (depth, width) = (4, 64)
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables(spark, dir, "documents")
  private val terms = Seq("spark", "customer", "the", "zzz_absent")

  private def estMap(table: String): Map[String, Long] =
    CmsStream.estimate(spark, table, terms, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def batchEstMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    CountMin.estimateTerms(
      CountMin.buildTokens(df, "text", depth, width), terms, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("triggers sum to the batch sketch over the union; replay is idempotent") {
    val table = "cms_stream_spec_a"
    val b0 = docs.filter(col("doc_id") < 50)
    val b1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 120)

    CmsStream.trigger(b0, 0L, "text", table, depth, width)
    CmsStream.trigger(b1, 1L, "text", table, depth, width)
    val streamed = estMap(table)
    val batch = batchEstMap(docs.filter(col("doc_id") < 120))
    assert(streamed == batch,
      s"streamed sketch must equal the one-shot batch sketch: $streamed vs $batch")

    // a re-fired trigger with an already-landed id must change nothing
    CmsStream.trigger(b0, 0L, "text", table, depth, width)
    assert(estMap(table) == batch, "replayed batch must not double-count")
    // and the table stays bounded: <= d*w rows per landed batch id
    val n = spark.table(table).count()
    assert(n <= 2L * depth * width, s"cells table grew past its bound: $n")
  }

  test("compact folds history, preserves estimates, stays bounded") {
    val table = "cms_stream_spec_b"
    CmsStream.trigger(docs.filter(col("doc_id") < 80), 0L, "text", table, depth, width)
    CmsStream.trigger(docs.filter(col("doc_id") >= 80 && col("doc_id") < 160),
      1L, "text", table, depth, width)
    val before = estMap(table)
    CmsStream.compact(spark, table)
    assert(estMap(table) == before, "compaction must not change estimates")
    assert(spark.table(table).count() <= depth.toLong * width)
    assert(spark.table(table).select("src_batch").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(CmsStream.NoBatch))
  }

  test("compact crash-orphan: a half-written next version stays invisible") {
    import graft.core.VersionedTable
    val table = "cms_stream_spec_d"
    val b0 = docs.filter(col("doc_id") < 70)
    val b1 = docs.filter(col("doc_id") >= 70 && col("doc_id") < 140)
    CmsStream.trigger(b0, 0L, "text", table, depth, width)
    CmsStream.trigger(b1, 1L, "text", table, depth, width)
    val before = estMap(table)
    assert(VersionedTable.physicalTable(spark, table) === s"${table}_v1")

    // a compact that crashed after writing v2 but BEFORE the view
    // retarget: the orphan must capture neither reads nor the replay
    // guard nor appends — the view still defines the current version
    spark.table(table).limit(1).write.saveAsTable(s"${table}_v2")
    assert(VersionedTable.physicalTable(spark, table) === s"${table}_v1",
      "an orphan next-version table must not capture reads/appends")
    assert(estMap(table) == before, "orphan must not change estimates")
    // post-crash replay of a landed id is still skipped (guard reads v1)
    CmsStream.trigger(b0, 0L, "text", table, depth, width)
    assert(estMap(table) == before,
      "replay after a crashed compact must not double-count")

    // ...and the next successful compact overwrites + supersedes it
    CmsStream.compact(spark, table)
    assert(VersionedTable.physicalTable(spark, table) === s"${table}_v2")
    assert(estMap(table) == before, "re-run compact must serve the same state")
    assert(!spark.catalog.tableExists(s"${table}_v1"),
      "the superseded version must be dropped after the swap")
    assert(spark.table(table).select("src_batch").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(CmsStream.NoBatch))
  }

  test("seed composes with later triggers") {
    val table = "cms_stream_spec_c"
    CmsStream.seed(docs.filter(col("doc_id") < 100), "text", table, depth, width)
    CmsStream.trigger(docs.filter(col("doc_id") >= 100 && col("doc_id") < 150),
      0L, "text", table, depth, width)
    assert(estMap(table) == batchEstMap(docs.filter(col("doc_id") < 150)))
  }
}

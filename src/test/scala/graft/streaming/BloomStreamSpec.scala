package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup behind the driver-resident Bloom prefilter:
  * cross-trigger semantics, replay-safety under a re-executed batchId,
  * bitmap recovery from the keys table, per-trigger cache hygiene. */
class BloomStreamSpec extends SparkSpec {

  private val M = 4096 // small bitmap: false positives possible -> the
  private val K = 5    // verification branch must do real work

  private def freshTable(name: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    name
  }

  test("stream delivers only keys unseen across corpus and earlier triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tbl = freshTable("bloom_keys_a")
    BloomStream.seed(Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id"), "doc_id", tbl)
    val st = BloomStream.recover(spark, tbl, "doc_id", M, K)

    val delivered = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val mem = MemoryStream[Long]
    val q = BloomStream.dedupExactStream(
      mem.toDF().toDF("doc_id"), "doc_id", tbl, st,
      sink = s => delivered.synchronized {
        delivered += s.select("doc_id").collect().map(_.getLong(0)).toSet
      })
    try {
      // batch 1: 4,5 are corpus members; 10,11 new; 10 twice intra-batch
      mem.addData(4L, 5L, 10L, 11L, 10L); q.processAllAvailable()
      // batch 2: 10 is now an earlier survivor; 5 still corpus; 20 new
      mem.addData(10L, 5L, 20L); q.processAllAvailable()
    } finally q.stop()
    assert(delivered.toList == List(Set(10L, 11L), Set(20L)))
    // keys table = corpus + survivors, one row per key (refresh: the
    // test's read is outside the trigger's own refreshTable)
    spark.catalog.refreshTable(tbl)
    val rows = spark.table(tbl).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 1L, 11L -> 1L, 20L -> 1L))
  }

  test("replayed trigger redelivers the same survivors; table stays single-copy") {
    import spark.implicits._
    val tbl = freshTable("bloom_keys_b")
    BloomStream.seed(Seq(1L, 2L).toDF("doc_id"), "doc_id", tbl)
    val st = BloomStream.recover(spark, tbl, "doc_id", M, K)
    val batch = Seq(1L, 7L, 8L).toDF("doc_id")
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def run(): Unit = BloomStream.trigger(batch, batchId = 42L, "doc_id", tbl,
      st, s => delivered += s.select("doc_id").collect().map(_.getLong(0)).toSet)
    run() // original execution: survivors appended, bitmap OR'd
    run() // at-least-once replay AFTER the append landed
    assert(delivered.toList == List(Set(7L, 8L), Set(7L, 8L)),
      "a replay must re-deliver the same survivors, not drop them")
    spark.catalog.refreshTable(tbl)
    val counts = spark.table(tbl).groupBy("doc_id").count()
      .filter(col("count") > 1).collect()
    assert(counts.isEmpty, s"duplicate key rows after replay: ${counts.mkString}")
  }

  test("recovered bitmap has no false negatives over the full keys table") {
    import spark.implicits._
    val tbl = freshTable("bloom_keys_c")
    val keys = (0L until 300L).map(_ * 7L)
    BloomStream.seed(keys.toDF("doc_id"), "doc_id", tbl)
    val st = BloomStream.recover(spark, tbl, "doc_id", M, K)
    val probed = graft.operators.Dedup.bloomProbe(
      keys.toDF("doc_id"), "doc_id", st.frame(spark), M, K)
    assert(probed.filter(!col("bloom_pass")).count() == 0L,
      "a member key must never be rejected by the recovered bitmap")
  }

  test("trigger leaves no cache entries behind") {
    import spark.implicits._
    val tbl = freshTable("bloom_keys_d")
    val st = BloomStream.recover(spark, tbl, "doc_id", M, K)
    val before = spark.sparkContext.getPersistentRDDs.size
    BloomStream.trigger(Seq(1L, 2L, 3L).toDF("doc_id"), 0L, "doc_id", tbl,
      st, _.count())
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "per-trigger caches must be unpersisted in the trigger body")
  }
}

package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only stage bisection for the streaming replay gates
  * (GRAFT_PEEK=1): where do stream_bloom_replay's /
  * stream_banddedup_replay's bench seconds go — state build, triggers,
  * or the counting output? */
class StreamGatesPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.1")

  private def t0[A](label: String)(body: => A): A = {
    val start = System.nanoTime()
    val r = body
    info(f"$label: ${(System.nanoTime() - start) / 1e9}%.3f s")
    r
  }

  test("stream_bloom_replay stage split") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    import graft.streaming.BloomStream
    val (mBits, k) = (131072, 5)
    val keys = graft.core.Tables(spark, dir, "documents").select(col("doc_id"))
    def slice(lo: Int, hi: Int) =
      keys.filter(col("doc_id") >= lo && col("doc_id") < hi)
    val table = "peek_bloom_stream"
    (1 to 2).foreach { pass =>
      info(s"--- pass $pass")
      if (!spark.catalog.tableExists(table))
        t0("seed")(BloomStream.seed(slice(0, 100), "doc_id", table))
      val state = t0("recover")(
        BloomStream.recover(spark, table, "doc_id", mBits, k))
      val delivered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val sink = (df: DataFrame) => {
        delivered += df.localCheckpoint(true); ()
      }
      val b0 = slice(100, 200).unionByName(slice(0, 20))
      val b1 = slice(200, 300).unionByName(slice(120, 140))
        .unionByName(slice(20, 40))
      t0("trigger b0")(BloomStream.trigger(b0, 0L, "doc_id", table, state, sink))
      t0("trigger b1")(BloomStream.trigger(b1, 1L, "doc_id", table, state, sink))
      t0("replay b0")(BloomStream.trigger(b0, 0L, "doc_id", table, state, sink))
      val counts = delivered.reduceOption(_.unionByName(_))
        .getOrElse(keys.limit(0))
        .groupBy("doc_id").agg(count(lit(1)).as("n_deliveries"))
      spark.catalog.refreshTable(table)
      val keyRows = spark.table(table)
        .groupBy("doc_id").agg(count(lit(1)).as("n_key_rows"))
      val out = keys.filter(col("doc_id") < 300)
        .join(counts, Seq("doc_id"), "left")
        .join(keyRows, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_deliveries"), lit(0L)).as("n_deliveries"),
          coalesce(col("n_key_rows"), lit(0L)).as("n_key_rows"))
        .orderBy("doc_id")
      t0("output join")(out.write.format("noop").mode("overwrite").save())
    }
  }

  test("stream_banddedup_replay stage split") {
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    import graft.streaming.EventStreams
    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def slice(lo: Int, hi: Int) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    val idx = "peek_band_stream"
    (1 to 2).foreach { pass =>
      info(s"--- pass $pass")
      t0("index build")(graft.operators.BandIndex.build(slice(0, 300),
        "doc_id", "text", numHashes = 64, bands = 16, buckets = 8, idx))
      val delivered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val sink = (df: DataFrame) => {
        delivered += df.select("doc_id").localCheckpoint(true); ()
      }
      val (b0, b1) = (slice(300, 350), slice(350, 400))
      t0("trigger b0")(EventStreams.growIndexTrigger(b0, 0L, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.8, idx, buckets = 8, sink))
      t0("replay b0")(EventStreams.growIndexTrigger(b0, 0L, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.8, idx, buckets = 8, sink))
      t0("trigger b1")(EventStreams.growIndexTrigger(b1, 1L, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.8, idx, buckets = 8, sink))
      val counts = delivered.reduceOption(_.unionByName(_))
        .getOrElse(docs.select("doc_id").limit(0))
        .groupBy("doc_id").agg(count(lit(1)).as("n_deliveries"))
      val idxRows = graft.core.VersionedTable.refreshed(spark, s"${idx}_toks")
        .groupBy("doc_id").agg(count(lit(1)).as("n_index_rows"))
      val out = slice(300, 400).select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .join(idxRows, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_deliveries"), lit(0L)).as("n_deliveries"),
          coalesce(col("n_index_rows"), lit(0L)).as("n_index_rows"))
        .orderBy("doc_id")
      t0("output join")(out.write.format("noop").mode("overwrite").save())
    }
  }
}

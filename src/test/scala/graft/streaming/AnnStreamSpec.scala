package graft.streaming

import graft.SparkSpec
import graft.etl.ParquetStore
import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replay safety of the streaming IVF-append path: a retried trigger
  * (foreachBatch's at-least-once contract) must re-deliver the same
  * assignments while the persisted cells layout converges to one row
  * per vector. */
class AnnStreamSpec extends SparkSpec {

  private def emb = graft.core.Tables(spark, "/root/testdata/sf0.001",
    "embeddings").select(col("vec_id"), col("embedding"))

  test("replayed trigger re-delivers the same assignment, appends nothing") {
    val store = new ParquetStore(spark, tmpDir("annstream"))
    IvfIndex.buildPortable(emb.filter(col("vec_id") < 100), store, "idx",
      numCentroids = 8)
    val delivered = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val sink = (df: DataFrame) => { delivered += df.localCheckpoint(true); () }
    val b0 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 130)

    AnnStream.trigger(b0, 0L, store, "idx", sink)
    val firstCells = store.read("idx_cells")
      .filter(col("src_batch") === 0L).collect().map(_.toSeq).toSet
    AnnStream.trigger(b0, 0L, store, "idx", sink) // at-least-once replay

    // delivery is at-least-once AND deterministic: twice, byte-identical
    assert(delivered.size === 2)
    assert(cells(delivered(0)) === cells(delivered(1)))
    assert(delivered(0).count() === 30)
    // the index converged: the replay appended no rows
    val after = store.read("idx_cells").filter(col("src_batch") === 0L)
    assert(after.count() === 30)
    assert(after.collect().map(_.toSeq).toSet === firstCells)
  }

  test("ivfAppendStream delivers each micro-batch's assignment and grows the index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = new ParquetStore(spark, tmpDir("annstream_q"))
    IvfIndex.buildPortable(emb.filter(col("vec_id") < 100), store, "idx",
      numCentroids = 8)
    val rows = emb.filter(col("vec_id") >= 100 && col("vec_id") < 140)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.ivfAppendStream(
      mem.toDF().toDF("vec_id", "embedding"), store, "idx",
      sink = s => delivered.synchronized {
        delivered += s.select("vec_id").collect().map(_.getLong(0)).toSet
      })
    try {
      mem.addData(rows.take(20).toSeq); q.processAllAvailable()
      mem.addData(rows.drop(20).toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(delivered.toList ===
      List(rows.take(20).map(_._1).toSet, rows.drop(20).map(_._1).toSet))
    // index grew by exactly the streamed vectors, one row each, and the
    // streamed layout equals the one-shot batch assignment
    val appended = store.read("idx_cells")
      .filter(col("src_batch") =!= IvfIndex.NoBatch)
    assert(appended.count() === 40)
    assert(appended.select("cand_id").distinct().count() === 40)
  }

  test("appending onto a pre-src_batch cells layout fails loudly") {
    // a cells directory persisted before src_batch tagging must be
    // rebuilt, not appended onto — a guardless append would mix schemas
    // in one directory (IvfIndex format guard)
    val store = new ParquetStore(spark, tmpDir("annstream_l"))
    IvfIndex.buildPortable(emb.filter(col("vec_id") < 50), store, "idx",
      numCentroids = 8)
    val legacy = store.read("idx_cells").drop("src_batch")
      .localCheckpoint(true) // materialize before overwriting its source
    store.writePartitioned("idx_cells", legacy, Seq("cell"))
    val e = intercept[IllegalStateException] {
      IvfIndex.append(
        emb.filter(col("vec_id") >= 50 && col("vec_id") < 60), store, "idx")
    }
    assert(e.getMessage.contains("predates src_batch"))
  }

  test("streamed appends equal the non-streaming append; query unaffected") {
    val streamed = new ParquetStore(spark, tmpDir("annstream_s"))
    val batch = new ParquetStore(spark, tmpDir("annstream_b"))
    val corpus = emb.filter(col("vec_id") < 100)
    for (st <- Seq(streamed, batch))
      IvfIndex.buildPortable(corpus, st, "idx", numCentroids = 8)
    val b0 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 130)
    val b1 = emb.filter(col("vec_id") >= 130 && col("vec_id") < 160)

    AnnStream.trigger(b0, 0L, streamed, "idx", _ => ())
    AnnStream.trigger(b0, 0L, streamed, "idx", _ => ()) // replay
    AnnStream.trigger(b1, 1L, streamed, "idx", _ => ())
    IvfIndex.append(b0, batch, "idx")
    IvfIndex.append(b1, batch, "idx")

    def layout(st: ParquetStore) = st.read("idx_cells")
      .select(col("cand_id"), col("cell")).collect().map(_.toSeq).toSet
    assert(layout(streamed) === layout(batch))
    // the extra src_batch column never leaks into query results
    val q = IvfIndex.query(streamed, "idx",
      emb.filter(col("vec_id") < 3), k = 5, nProbe = 4)
    assert(q.columns.toSeq === Seq("query_id", "cand_id", "cosine", "rn"))
    assert(q.count() === 15)
  }
}

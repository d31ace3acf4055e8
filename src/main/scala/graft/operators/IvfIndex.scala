package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.ParquetStore

/** Persisted IVF index lifecycle: build once, query many times.
  *
  * Build writes two artifacts into a [[ParquetStore]]:
  *  - `<name>_centroids`: the (tiny) Lloyd-refined coarse quantizer;
  *  - `<name>_cells`: every vector tagged with its cell, laid out as a
  *    HIVE-PARTITIONED dataset on `cell`.
  *
  * The partitioned layout is the scale story: a query probes `nProbe`
  * cells, and the cell equi-join prunes the scan to exactly those
  * directories (dynamic partition pruning) — at 100 TB the index read is
  * proportional to cells probed, not corpus size, which is the defining
  * property of an inverted-file index. */
object IvfIndex {

  /** `src_batch` value for rows landed by a build (or a non-streaming
    * append): no real micro-batch id, so no replay guard can ever
    * exclude them — the same sentinel contract as
    * [[graft.streaming.BloomStream.NoBatch]] / [[BandIndex]]. */
  val NoBatch: Long = -1L

  def build(vectors: DataFrame, store: ParquetStore, name: String,
      numCentroids: Int, lloydIters: Int): Unit =
    buildFrom(vectors, store, name,
      Similarity.kmeansCentroids(
        vectors.select(col("vec_id"), col("embedding")), numCentroids,
        lloydIters))

  /** [[build]] with the engine-portable md5-sample coarse quantizer
    * ([[Similarity.portableCentroids]]) instead of the Lloyd-refined one
    * — same dataflow, but every downstream read of the index (cell
    * assignment included) is SQL-replayable, which is what puts the
    * persisted-index STREAMING path under a hash-checked oracle
    * (gate stream_ann_append_replay), exactly as sim_ann_ivf_fixed does
    * for the inline pipeline. */
  def buildPortable(vectors: DataFrame, store: ParquetStore, name: String,
      numCentroids: Int): Unit =
    buildFrom(vectors, store, name,
      Similarity.portableCentroids(
        vectors.select(col("vec_id"), col("embedding")), numCentroids))

  private def buildFrom(vectors: DataFrame, store: ParquetStore,
      name: String, centroids: DataFrame): Unit = {
    store.write(s"${name}_centroids", centroids)
    store.writePartitioned(s"${name}_cells",
      assign(vectors, centroids).withColumn("src_batch", lit(NoBatch)),
      Seq("cell"))
  }

  /** Cell assignment of a vector frame against a centroid frame — the
    * shared E-step of build and append: (cand_id, cemb, cell), one
    * broadcast pass over the input. */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    Similarity.assignCells(
      vectors.select(col("vec_id").as("cand_id"),
        transform(col("embedding"), _.cast("double")).as("cemb")),
      "cand_id", "cemb", centroids, keep = 1)

  /** Assign `batch` against the index's FROZEN coarse quantizer — the
    * read half of [[append]], exposed so the streaming trigger can
    * deliver the assignment it is about to persist. */
  def assignToIndex(batch: DataFrame, store: ParquetStore,
      name: String): DataFrame =
    assign(batch, store.read(s"${name}_centroids"))

  /** Incremental maintenance (the nightly-ingest path, mirroring
    * [[BandIndex.append]]): assign ONLY `batch` to the EXISTING coarse
    * quantizer and append into the partitioned cells layout. The
    * centroids are deliberately frozen — that is what makes the nightly
    * cost O(|batch|) (one broadcast of ≤numCentroids rows against the
    * batch, no corpus scan) and keeps every previously-written cell file
    * untouched (hive append only creates new files under the partitions
    * the batch lands in, spec-pinned via the file listing). IVF recall
    * degrades gracefully if the data distribution drifts from the frozen
    * quantizer; the periodic `build` rebuild is the compaction step that
    * re-centers it. */
  def append(batch: DataFrame, store: ParquetStore, name: String): Unit =
    appendCells(assignToIndex(batch, store, name), store, name, NoBatch)

  /** Append pre-assigned cell rows, idempotently per micro-batch: rows
    * carry the batch id, and ids this batch ALREADY landed are skipped —
    * so a replayed foreachBatch trigger (at-least-once contract) cannot
    * duplicate index rows. Same guard shape as [[BandIndex.append]] /
    * BloomStream's key append; `NoBatch` skips the guard (non-streaming
    * callers, e.g. a backfill, manage their own idempotence). The
    * existing-rows read lists the cells directory before the append
    * plans its write, so the anti-join never sees its own output. */
  def appendCells(cells: DataFrame, store: ParquetStore, name: String,
      batchId: Long): Unit = {
    val target = s"${name}_cells"
    // format guard: a cells layout persisted before src_batch tagging
    // must be rebuilt, not appended onto — the replay guard's filter
    // would fail to resolve, and a guardless append would mix schemas
    // in one directory (schema inference then exposes or drops the
    // column depending on which footer is sampled). Same loud-rebuild
    // contract as BandIndex's sorted-arrays format note.
    if (store.exists(target)
        && !store.read(target).columns.contains("src_batch"))
      throw new IllegalStateException(
        s"IVF index '$name' predates src_batch tagging — rebuild it " +
          "(build/buildPortable) before appending")
    val unseen =
      if (batchId == NoBatch || !store.exists(target)) cells
      else cells.join(
        store.read(target).filter(col("src_batch") === batchId)
          .select(col("cand_id")),
        Seq("cand_id"), "left_anti")
    store.appendPartitioned(target,
      unseen.withColumn("src_batch", lit(batchId)), Seq("cell"))
  }

  def query(store: ParquetStore, name: String, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val centroids = store.read(s"${name}_centroids")
    val probes = Similarity.assignCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "query_id", "qe", centroids, keep = nProbe)
    val cells = store.read(s"${name}_cells")
    Similarity.rerankTopK(cells.join(broadcast(probes), Seq("cell")),
      k, "qe", "cemb")
  }
}

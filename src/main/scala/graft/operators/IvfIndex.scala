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

  def build(vectors: DataFrame, store: ParquetStore, name: String,
      numCentroids: Int, lloydIters: Int): Unit = {
    val centroids = Similarity.kmeansCentroids(
      vectors.select(col("vec_id"), col("embedding")), numCentroids, lloydIters)
    store.write(s"${name}_centroids", centroids)
    val cells = Similarity.assignCells(
      vectors.select(col("vec_id").as("cand_id"),
        transform(col("embedding"), _.cast("double")).as("cemb")),
      "cand_id", "cemb", centroids, keep = 1)
    store.writePartitioned(s"${name}_cells", cells, Seq("cell"))
  }

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
  def append(batch: DataFrame, store: ParquetStore, name: String): Unit = {
    val centroids = store.read(s"${name}_centroids")
    val cells = Similarity.assignCells(
      batch.select(col("vec_id").as("cand_id"),
        transform(col("embedding"), _.cast("double")).as("cemb")),
      "cand_id", "cemb", centroids, keep = 1)
    store.appendPartitioned(s"${name}_cells", cells, Seq("cell"))
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

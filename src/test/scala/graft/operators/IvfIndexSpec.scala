package graft.operators

import graft.SparkSpec
import graft.etl.ParquetStore
import org.apache.spark.sql.functions._

/** Persisted IVF index: build → store → query must agree with the inline
  * path, and the probed query must prune the cell scan. */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Tables(spark, dir, "embeddings")

  test("persisted index query equals the inline IVF path") {
    val store = new ParquetStore(spark, tmpDir("ivf"))
    IvfIndex.build(emb, store, "idx", numCentroids = 16, lloydIters = 1)
    val queries = emb.filter(col("vec_id") < 10)

    val persisted = IvfIndex.query(store, "idx", queries, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val inline = Similarity.ivfTopK(queries, emb,
        numCentroids = 16, k = 5, nProbe = 4, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(persisted === inline)
    assert(persisted.nonEmpty)
  }

  test("probing reads only the probed cells (partition pruning on the scan)") {
    val store = new ParquetStore(spark, tmpDir("ivf2"))
    IvfIndex.build(emb, store, "idx", numCentroids = 16, lloydIters = 0)
    val q = IvfIndex.query(store, "idx", emb.filter(col("vec_id") < 3),
      k = 5, nProbe = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // dynamic partition pruning: the probe side's cell set is broadcast
    // into the cells scan as a runtime partition filter, so unprobed cell
    // directories are never read — index I/O ∝ cells probed, not corpus
    assert(plan.contains("dynamicpruning"),
      "cells scan is not DPP-pruned:\n" + plan.take(3000))
  }
}

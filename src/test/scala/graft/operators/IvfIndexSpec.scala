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

  test("append assigns to frozen centroids; existing cell files untouched; parity with one-shot") {
    def files(root: String): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.startsWith("_") || c.getName.startsWith(".")) Seq.empty
          else Seq(c.getAbsolutePath)
        }
      walk(new java.io.File(root)).toSet
    }
    val root = tmpDir("ivf3")
    val store = new ParquetStore(spark, root)
    val c1 = emb.filter(col("vec_id") < 300)
    val c2 = emb.filter(col("vec_id") >= 300)
    val queries = emb.filter(col("vec_id") < 10)

    IvfIndex.build(c1, store, "idx", numCentroids = 16, lloydIters = 1)
    val before = files(s"$root/idx_cells.parquet")
    IvfIndex.append(c2, store, "idx")
    val after = files(s"$root/idx_cells.parquet")
    // nightly cost is O(batch): the corpus-side cell files are never
    // rewritten — append only adds files under the touched partitions
    assert(before.subsetOf(after) && after.size > before.size,
      "append must only add cell files")

    // parity: the appended index answers exactly like assigning the full
    // corpus to the same frozen quantizer in one shot
    val persisted = IvfIndex.query(store, "idx", queries, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val centroids = store.read("idx_centroids")
    val oneShot = Similarity.ivfFromCentroids(queries, emb, centroids,
        k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(persisted === oneShot)
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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted dedup band index — the corpus side of incremental near-dup
  * dedup ([[Dedup.incrementalNearDups]]) stored ONCE so nightly batches
  * re-sketch only themselves.
  *
  * Two bucketed+sorted tables per index:
  *  - `<name>_bands` (doc_id, n_toks, band_idx, band_hash), bucketed on
  *    the candidate-join keys (band_idx, band_hash): each batch's
  *    candidate join reads corpus buckets IN PLACE — the only exchange is
  *    the (batch-sized) new side being hashed to the bucket layout. The
  *    corpus, which is orders of magnitude larger than a nightly batch,
  *    never reshuffles after index build.
  *  - `<name>_toks` (doc_id, toks, n_toks), bucketed on doc_id, serving
  *    the verification join the same way.
  *
  * This is the batch analogue of [[IvfIndex]]'s persisted-cells layout
  * (there: hive-partitioned for partition pruning; here: bucketed for
  * exchange-free equi-joins — the join key is high-cardinality, so
  * bucketing, not partitioning, is the right layout). Rebuild = `build`
  * with overwrite; appending a deduped batch to the index is the same
  * `build` over the union at the next compaction.
  *
  * A BandIndexSpec pins (a) result parity with the index-free
  * [[Dedup.incrementalNearDups]] and (b) that the corpus band scan is
  * bucketed in the executed plan.
  */
object BandIndex {

  /** Sketch `corpus` with the portable family and persist the two index
    * tables under `name` (`spark.sql.warehouse.dir` / session catalog). */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, buckets: Int, name: String): Unit = {
    val (bandsDf, sets) = Dedup.portableSketch(corpus, idCol, textCol,
      numHashes, bands)
    bandsDf.write.mode("overwrite")
      .bucketBy(buckets, "band_idx", "band_hash")
      .sortBy("band_idx", "band_hash")
      .saveAsTable(s"${name}_bands")
    sets.groupBy("doc_id")
      .agg(collect_set(col("w")).as("toks"), count(lit(1)).as("n_toks"))
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(s"${name}_toks")
  }

  /** Verified near-dup matches of a new batch against the persisted
    * index: (id_new, id_ref, jaccard). Identical output to
    * [[Dedup.incrementalNearDups]](newDocs, corpus, ...) by construction
    * (same sketch family, same verification tail — spec-pinned). */
  def matches(newDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, threshold: Double, name: String): DataFrame = {
    val (newBands, newSets) = Dedup.portableSketch(newDocs, idCol, textCol,
      numHashes, bands)
    matchesFrom(newBands, newSets, threshold, name)
  }

  /** The index-join tail of [[matches]], split out so callers that own the
    * sketch-frame lifecycle (the streaming path, which must unpersist per
    * micro-batch) can pass pre-sketched frames. */
  private def matchesFrom(newBands: DataFrame, newSets: DataFrame,
      threshold: Double, name: String): DataFrame = {
    val spark = newBands.sparkSession
    val refBands = spark.table(s"${name}_bands")
    val refToks = spark.table(s"${name}_toks")
    val cands = newBands.as("a")
      .join(refBands.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("id_new"), col("b.doc_id").as("id_ref"),
        col("a.n_toks").as("n1"), col("b.n_toks").as("n2"))
      .distinct()
    val newArr = newSets.groupBy("doc_id")
      .agg(collect_set(col("w")).as("toks1"))
      .withColumnRenamed("doc_id", "id_new")
    val refArr = refToks
      .select(col("doc_id").as("id_ref"), col("toks").as("toks2"))
    Dedup.crossVerify(cands, newArr, refArr, threshold)
  }

  /** New docs that survive the index check (left-anti on matched ids). */
  def dedupAgainst(newDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, threshold: Double, name: String): DataFrame =
    newDocs.join(
      matches(newDocs, idCol, textCol, numHashes, bands, threshold, name)
        .select(col("id_new").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Bounded-lifecycle [[dedupAgainst]] for long-running callers
    * (streaming foreachBatch): runs `use` on the surviving docs, then
    * unpersists the per-batch sketch frames that
    * [[Dedup.portableSketch]] cached. A batch caller relies on the
    * harness-scoped `clearCache()`; a stream has no such scope, so
    * without this every trigger would leak one band + one token-set
    * cache entry into the CacheManager for the life of the query. The
    * corpus side needs no eviction — it lives in the on-disk bucketed
    * index tables, never the cache. */
  def dedupAgainstEphemeral(newDocs: DataFrame, idCol: String,
      textCol: String, numHashes: Int, bands: Int, threshold: Double,
      name: String)(use: DataFrame => Unit): Unit = {
    val (newBands, newSets) = Dedup.portableSketch(newDocs, idCol, textCol,
      numHashes, bands)
    val survivors = newDocs.join(
      matchesFrom(newBands, newSets, threshold, name)
        .select(col("id_new").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
    try use(survivors)
    finally { newBands.unpersist(); newSets.unpersist() }
  }
}

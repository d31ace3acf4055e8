package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted band index: parity with the index-free incremental dedup and
  * the bucketed-scan (no corpus reshuffle) layout property. */
class BandIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables(spark, dir, "documents")

  test("index matches == index-free incremental matches; corpus scan bucketed") {
    val corpus = docs.filter(col("doc_id") < 100)
    val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)

    BandIndex.build(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, buckets = 8, name = "bidx")

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val viaIndex = BandIndex.matches(batch, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.8, name = "bidx")
    val direct = Dedup.incrementalNearDups(batch, corpus,
      "doc_id", "text", numHashes = 64, bands = 16, threshold = 0.8)
    assert(rows(viaIndex) === rows(direct),
      "persisted-index matches must equal the index-free pipeline")
    assert(rows(direct).nonEmpty)

    // layout property: the candidate join reads the corpus bands as a
    // BUCKETED scan (no exchange rebuilding the corpus partitioning)
    viaIndex.collect()
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      "corpus band scan must be bucketed:\n" + plan.take(3000))

    // survivors partition the batch exactly as the index-free form does
    val sIdx = BandIndex.dedupAgainst(batch, "doc_id", "text",
        64, 16, 0.8, "bidx")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sDirect = Dedup.dedupAgainstCorpus(batch, corpus,
        "doc_id", "text", 64, 16, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sIdx === sDirect)
  }
}

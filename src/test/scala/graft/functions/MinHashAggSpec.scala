package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The native sketch aggregate must be value-identical to the declarative
  * numHashes-column formulation — signatures are interchangeable. */
class MinHashAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("MinHashAgg signatures == 64 separate min(xxhash64) aggregates") {
    val docs = graft.core.Tables(spark, dir, "documents").limit(100)
    val sets = Dedup.tokenSet(docs, "doc_id", "text")

    val viaAgg = Dedup.minhashSignaturesAgg(sets, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaCols = Dedup.minhashSignatures(sets, 16)
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(i => r.getLong(i)).toVector).toMap

    assert(viaAgg === viaCols)
  }

  test("partial/merge path: signatures stable under repartitioning") {
    val docs = graft.core.Tables(spark, dir, "documents").limit(50)
    val sets = Dedup.tokenSet(docs, "doc_id", "text")
    val once = Dedup.minhashSignaturesAgg(sets, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val scattered = Dedup.minhashSignaturesAgg(sets.repartition(13), 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(once === scattered)
  }

  test("SQL reachability") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("id", "w")
      .createOrReplaceTempView("toks")
    val rows = spark.sql(
      "SELECT id, graft_minhash(w, 4) AS sig FROM toks GROUP BY id ORDER BY id")
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getSeq[Long](1).size === 4)
    // doc 2's signature over {a} must dominate doc 1's over {a,b} element-wise
    val s1 = rows(0).getSeq[Long](1); val s2 = rows(1).getSeq[Long](1)
    assert(s1.zip(s2).forall { case (a, b) => a <= b })
  }
}

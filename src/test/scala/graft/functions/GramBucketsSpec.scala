package graft.functions

import graft.SparkSpec
import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** The fused [[GramBuckets]] kernel against the composed column-algebra
  * form (bigram transform + concat_ws + explode + hash60 mod) — the
  * two-implementation equality discipline: the composed form is what
  * the DuckDB oracle replays, so fused == composed certifies the kernel
  * against the correctness gate without leaving the JVM. Compared as
  * multisets (the kernel interleaves unigrams/bigrams in token order;
  * every consumer aggregates, so order is out of contract). */
class GramBucketsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private def composed(df: org.apache.spark.sql.DataFrame,
      buckets: Int): Map[Long, Map[Long, Long]] =
    df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), explode(concat(
        col("toks"),
        when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - lit(1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(2)))))
          .otherwise(array()))).as("w"))
      .select(col("doc_id"),
        pmod(Sampling.hash60(col("w")), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "b").count().collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }

  private def fused(df: org.apache.spark.sql.DataFrame,
      buckets: Int): Map[Long, Map[Long, Long]] = {
    GraftFunctions.register(spark)
    df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        explode(GraftFunctions.gramBuckets(col("toks"), buckets)).as("b"))
      .groupBy("doc_id", "b").count().collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
  }

  test("fused == composed on the sf0.001 documents table") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val f = fused(docs, 256)
    val c = composed(docs, 256)
    assert(f.nonEmpty)
    assert(f === c)
  }

  test("fused == composed on crafted edge docs and bucket counts") {
    val rows = Seq(
      Row(1L, "one"), // single token: no bigram
      Row(2L, "a b"), // one bigram
      Row(3L, "a a a"), // repeated tokens: duplicate buckets kept
      Row(4L, "x y z w v u t s r q p"),
      Row(5L, "token~1 token~2 token~3")) // scale-suffix shapes
    for (buckets <- Seq(1, 7, 256)) {
      val df = mkDf(schema, rows)
      assert(fused(df, buckets) === composed(df, buckets),
        s"divergence at buckets=$buckets")
    }
  }

  test("SQL registration + arity/literal checks") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a b c").toDF("text").createOrReplaceTempView("gram_probe")
    val n = spark.sql(
      "SELECT size(graft_gram_buckets(split(text, ' '), 16)) AS n " +
        "FROM gram_probe").collect()(0).getInt(0)
    assert(n === 5) // 3 unigrams + 2 bigrams
    val err = intercept[Exception](spark.sql(
      "SELECT graft_gram_buckets(split(text, ' ')) FROM gram_probe").collect())
    assert(err.getMessage.contains("graft_gram_buckets"))
  }
}

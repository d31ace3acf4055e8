package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev-only stage-bisection for the sim hot path (run manually via
  * testOnly). */
class SimPlanPeek extends SparkSpec {

  private val dir =
    sys.env.getOrElse("GRAFT_PEEK_DIR", "/root/testdata/sf0.01")

  private def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  test("quantizedTopK stage bisection") {
    // dev tool: opt in with GRAFT_PEEK=1 (timing output only, no pins)
    assume(sys.env.get("GRAFT_PEEK").contains("1"))
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = Similarity.quantizeInt8(emb)
      .select(col("vec_id").as("cand_id"), col("qvec").as("ce"))

    time("quantize only")(c)
    // two-step variant: scale materialized per row, lambda references the
    // plain column — IF CollapseProject leaves it alone
    val e2 = transform(col("embedding"), _.cast("double"))
    val twoStep = emb
      .select(col("vec_id"), e2.as("e"))
      .select(col("vec_id"), col("e"),
        greatest(array_max(transform(col("e"), x => abs(x))) / lit(127.0),
          lit(1e-30)).as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("e"), x => round(x / col("scale")).cast("long")).as("qvec"))
    time("quantize two-step")(twoStep)
    twoStep.explain("formatted")
    val joined = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
    time("join only (no score)")(joined.select("cand_id", "query_id"))
    val scored = joined
      .withColumn("cos", Similarity.cosine(col("qe"), col("ce")))
      .select("cand_id", "query_id", "cos")
    time("join + cosine")(scored)

    // isolate: cosine over a long array built WITHOUT the quantize kernel
    val cLong = emb.select(col("vec_id").as("cand_id"),
      transform(col("embedding"), x => (x * 10).cast("long")).as("ce"))
    time("join + cosine (plain long array)")(
      cLong.crossJoin(broadcast(q))
        .filter(col("cand_id") =!= col("query_id"))
        .withColumn("cos", Similarity.cosine(col("qe"), col("ce")))
        .select("cand_id", "query_id", "cos"))

    // isolate: quantize materialized first (checkpoint barrier), then join
    val cMat = c.localCheckpoint()
    time("join + cosine (pre-materialized quantize)")(
      cMat.crossJoin(broadcast(q))
        .filter(col("cand_id") =!= col("query_id"))
        .withColumn("cos", Similarity.cosine(col("qe"), col("ce")))
        .select("cand_id", "query_id", "cos"))
    time("full quantizedTopK")(
      Similarity.quantizedTopK(emb.filter(col("vec_id") < 10), emb, 5))
    time("full bruteForceTopK")(
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5))
  }
}

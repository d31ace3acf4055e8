package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused first-collision predicate vs the higher-order-function
  * reference form, through both eval paths and both element types. */
class PrefixCollisionSpec extends SparkSpec {

  // HOF reference: exists j < len with a[j] == b[j] (the form the kernel
  // replaces — CodegenFallback, so it doubles as an interpreted oracle)
  private def hofForm = exists(
    zip_with(
      slice(col("a"), lit(1), col("len")),
      slice(col("b"), lit(1), col("len")),
      (x, y) => x === y),
    identity)

  test("agrees with the HOF form on random long arrays, all prefix lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { _ =>
      val n = 1 + rnd.nextInt(16)
      // small value domain so collisions actually occur
      val a = Array.fill(n)(rnd.nextInt(4).toLong)
      val b = Array.fill(n)(rnd.nextInt(4).toLong)
      (a, b, rnd.nextInt(n + 1))
    }
    val df = rows.toDF("a", "b", "len")
    val diffs = df
      .withColumn("k", GraftFunctions.prefixCollision(col("a"), col("b"), col("len")))
      .withColumn("h", coalesce(hofForm, lit(false)))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diffs === 0L)
  }

  test("string arrays, len clamping, and empty prefixes") {
    import spark.implicits._
    val df = Seq(
      (Array("x", "y"), Array("x", "z"), 0, false), // empty prefix
      (Array("x", "y"), Array("x", "z"), 1, true),
      (Array("x", "y"), Array("z", "y"), 2, true),
      (Array("x", "y"), Array("z", "w"), 2, false),
      (Array("x"), Array("z", "x"), 9, false) // len beyond both arrays
    ).toDF("a", "b", "len", "want")
    val bad = df.filter(
      GraftFunctions.prefixCollision(col("a"), col("b"), col("len"))
        =!= col("want")).count()
    assert(bad === 0L)
  }

  test("interpreted eval path matches codegen (constant folding)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_prefix_collision(array(1L, 2L), array(9L, 2L), 2) AS hit,
        |       graft_prefix_collision(array(1L, 2L), array(9L, 2L), 1) AS miss
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
  }
}

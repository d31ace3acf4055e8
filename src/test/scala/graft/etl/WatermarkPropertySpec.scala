package graft.etl

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.jdk.CollectionConverters._

/** Property-based invariants of the watermark/incremental protocol
  * (SURVEY.md §5: `extract(full) ≡ extract(incr)∘…`): for any first wave
  * and any second wave, the delta is exactly the second-wave rows strictly
  * past the first wave's watermark — no duplicates, no over-capture.
  * (Raw ScalaCheck runner: the scalatest bridge artifact is not on the
  * offline classpath.) */
class WatermarkPropertySpec extends SparkSpec {

  private val base = Timestamp.valueOf("2023-01-01 00:00:00").getTime

  private def currencyDf(rows: Seq[(Int, Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (id, c, u) =>
        Row(id, s"C$id", new Timestamp(base + c * 1000), new Timestamp(base + u * 1000))
      }.asJava, Schemas.currency)

  // (id, created-offset-secs, updated-offset-secs), unique ids per wave
  private val waveGen: Gen[Seq[(Int, Long, Long)]] = for {
    n <- Gen.choose(1, 6)
    offs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0L, 5000L)))
  } yield offs.zipWithIndex.map { case ((c, u), i) => (i, c, u) }

  test("delta == second-wave rows strictly past the watermark") {
    val prop = Prop.forAll(waveGen, waveGen) { (wave1, wave2) =>
      val src = tmpDir("prop-src"); val landedDir = tmpDir("prop-landed")
      val srcStore = new ParquetStore(spark, src)
      val landed = new ParquetStore(spark, landedDir)
      val job = new IngestJob(new ParquetSource(spark, src), landed)

      srcStore.write("currency", currencyDf(wave1))
      job.run()
      val fullLanded = landed.read("currency").count() == wave1.size.toLong

      val cMax = wave1.map(_._2).max
      val uMax = wave1.map(_._3).max
      val shifted = wave2.map { case (i, c, u) => (i + 1000, c, u) }
      srcStore.write("currency", currencyDf(wave1 ++ shifted))
      job.run()

      val expected = shifted.filter { case (_, c, u) => c > cMax || u > uMax }
      val deltaOk =
        if (expected.isEmpty)
          // empty delta: landed object untouched (still wave1)
          landed.read("currency").count() == wave1.size.toLong
        else
          landed.read("currency").collect().map(_.getInt(0)).sorted.toSeq ==
            expected.map(_._1).sorted
      fullLanded && deltaOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(result.passed, result.toString)
  }
}

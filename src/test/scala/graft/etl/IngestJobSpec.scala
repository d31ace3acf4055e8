package graft.etl

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._

/** Extract-stage protocol (E1–E3): full first run, strict-`>` watermark
  * increments, empty deltas skipped — mirroring the reference's
  * test/test_extract.py:214-518 scenarios. */
class IngestJobSpec extends SparkSpec {

  private def writeSource(dir: String, tables: Map[String, org.apache.spark.sql.DataFrame]): Unit =
    tables.foreach { case (n, df) => new ParquetStore(spark, dir).write(n, df) }

  test("watermark = max(created_at), max(last_updated)") {
    val t1 = Timestamp.valueOf("2023-02-02 11:30:00")
    val df = spark.createDataFrame(Seq(
      Row(1, "AAA", Fixtures.t0, t1),
      Row(2, "BBB", t1, Fixtures.t0)).asJava, Schemas.currency)
    val m = Watermark.of(df).get
    assert(m.created === t1 && m.updated === t1)
  }

  test("first run lands every table in full; second run with no changes lands nothing") {
    val src = tmpDir("src"); val landedDir = tmpDir("landed")
    writeSource(src, Fixtures.all(spark))
    val landed = new ParquetStore(spark, landedDir)
    val job = new IngestJob(new ParquetSource(spark, src), landed)

    val first = job.run()
    assert(first.toSet === Fixtures.all(spark).keySet)
    assert(landed.read("address").count() === 5)
    assert(landed.read("payment").count() === 6)

    val second = job.run()
    assert(second.isEmpty) // all rows are <= watermark (strict >)
  }

  test("incremental run captures only rows past the watermark") {
    val src = tmpDir("src"); val landedDir = tmpDir("landed")
    writeSource(src, Map("currency" -> Fixtures.currency(spark)))
    val landed = new ParquetStore(spark, landedDir)
    val job = new IngestJob(new ParquetSource(spark, src), landed)
    job.run()

    // three inserts; one predates the watermark -> expect a 2-row delta
    val early = Timestamp.valueOf("2022-12-31 09:00:00")
    val feb = Timestamp.valueOf("2023-02-02 11:30:00")
    val mar = Timestamp.valueOf("2023-03-03 08:45:00")
    val withInserts = Fixtures.currency(spark).union(
      spark.createDataFrame(Seq(
        Row(90, "OLD", early, early),
        Row(91, "GBP", feb, feb),
        Row(92, "USD", mar, mar)).asJava, Schemas.currency))
    writeSource(src, Map("currency" -> withInserts))

    val updated = job.run()
    assert(updated === Seq("currency"))
    // landed object is REPLACED by the delta (reference same-key upload)
    val delta = landed.read("currency")
    assert(delta.count() === 2)
    assert(cells(delta.select(col("currency_id"))) === Set(Seq(91), Seq(92)))

    // next round: watermark advanced to mar; nothing new -> no delta
    assert(job.run().isEmpty)
  }

  test("a later UPDATE is re-captured via the last_updated OR-branch") {
    val src = tmpDir("src"); val landedDir = tmpDir("landed")
    writeSource(src, Map("payment" -> Fixtures.payment(spark)))
    val landed = new ParquetStore(spark, landedDir)
    val job = new IngestJob(new ParquetSource(spark, src), landed)
    job.run()

    val upd = Timestamp.valueOf("2023-04-04 10:00:00")
    val bd = new java.math.BigDecimal("99.99").setScale(2)
    val updatedPayment = spark.createDataFrame(Seq(
      Row(3, 3, 3, bd, 3, 3, true, "2023-01-01", 10000031, 10000032,
        Fixtures.t0, upd)).asJava, Schemas.payment)
    writeSource(src, Map("payment" ->
      Fixtures.payment(spark).filter(col("payment_id") =!= 3).union(updatedPayment)))

    assert(job.run() === Seq("payment"))
    val delta = landed.read("payment")
    assert(delta.count() === 1)
    assert(delta.collect()(0).getDecimal(3).toPlainString === "99.99")
  }

  test("parallelism > 1 lands the same results as the serial form") {
    val src = tmpDir("src")
    writeSource(src, Fixtures.all(spark))
    val serialDir = tmpDir("landed-serial"); val parDir = tmpDir("landed-par")
    val serialStore = new ParquetStore(spark, serialDir)
    val parStore = new ParquetStore(spark, parDir)
    val serial = new IngestJob(new ParquetSource(spark, src), serialStore)
    val par = new IngestJob(new ParquetSource(spark, src), parStore,
      parallelism = 4)

    // full round: same tables reported, in the same (listTables) order
    val s1 = serial.run(); val p1 = par.run()
    assert(p1 === s1)
    // every landed table is row-for-row identical
    Fixtures.all(spark).keySet.foreach { t =>
      assert(cells(parStore.read(t)) === cells(serialStore.read(t)),
        s"table $t diverged under parallel ingest")
    }

    // incremental round: both see the advanced watermark, both land the
    // same 1-table delta
    val feb = Timestamp.valueOf("2023-02-02 11:30:00")
    val withInsert = Fixtures.currency(spark).union(
      spark.createDataFrame(Seq(
        Row(91, "GBP", feb, feb)).asJava, Schemas.currency))
    writeSource(src, Map("currency" -> withInsert))
    assert(par.run() === serial.run())
    assert(cells(parStore.read("currency")) === cells(serialStore.read("currency")))
  }

  test("parallel run awaits every table before propagating a failure") {
    val src = tmpDir("src")
    writeSource(src, Map(
      "currency" -> Fixtures.currency(spark),
      "payment" -> Fixtures.payment(spark)))
    val inner = new ParquetSource(spark, src)
    // a source whose middle table always fails: run() must still land
    // the healthy tables (await-all semantics — a fail-fast await would
    // leave their writes racing in the background) and then rethrow
    val failing = new OltpSource {
      def listTables(): Seq[String] = Seq("currency", "broken", "payment")
      def full(table: String): org.apache.spark.sql.DataFrame =
        if (table == "broken") throw new RuntimeException("boom: broken table")
        else inner.full(table)
      def incremental(table: String, c: Timestamp, u: Timestamp): org.apache.spark.sql.DataFrame =
        if (table == "broken") throw new RuntimeException("boom: broken table")
        else inner.incremental(table, c, u)
    }
    val landedDir = tmpDir("landed-fail")
    val store = new ParquetStore(spark, landedDir)
    val job = new IngestJob(failing, store, parallelism = 3)
    val e = intercept[IngestJob.PartialIngestException](job.run())
    assert(e.getMessage.contains("boom"))
    assert(e.getCause.getMessage.contains("boom"))
    // the exception carries exactly the tables that landed, so a caller
    // can reconcile partial state instead of guessing
    assert(e.landed.toSet === Set("currency", "payment"))
    // both healthy tables completed their writes before the rethrow
    assert(store.read("currency").count() === Fixtures.currency(spark).count())
    assert(store.read("payment").count() === Fixtures.payment(spark).count())
  }
}

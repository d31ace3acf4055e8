package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** Builders over EMPTY inputs (the mid-stream empty-increment shape):
  * schemas must hold with zero rows — schema-on-read never infers here,
  * so empty frames cannot poison downstream types (SURVEY.md §1.3). */
class EmptyInputSpec extends SparkSpec {

  private def empty(name: String): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](),
      Schemas.sourceTables(name))

  test("every dim/fact builder yields the right columns on empty input") {
    val outputs = Seq(
      DimBuilders.dimLocation(empty("address")) -> 8,
      DimBuilders.dimDesign(empty("design")) -> 4,
      DimBuilders.dimCurrency(empty("currency")) -> 3,
      DimBuilders.dimCounterparty(empty("address"), empty("counterparty")) -> 9,
      DimBuilders.dimStaff(empty("staff"), empty("department")) -> 6,
      DimBuilders.dimTransaction(empty("transaction")) -> 4,
      DimBuilders.dimPaymentType(empty("payment_type")) -> 2,
      FactBuilders.factSalesOrder(empty("sales_order")) -> 14,
      FactBuilders.factPurchaseOrder(empty("purchase_order")) -> 14,
      FactBuilders.factPayment(empty("payment")) -> 12)
    outputs.foreach { case (df, nCols) =>
      assert(df.columns.length === nCols)
      assert(df.count() === 0)
    }
  }

  test("watermark over an empty table is None (forces a full rescan)") {
    assert(Watermark.of(empty("currency")).isEmpty)
  }

  test("ingest job skips empty source tables entirely") {
    val src = tmpDir("empty-src"); val landedDir = tmpDir("empty-landed")
    new ParquetStore(spark, src).write("currency", empty("currency"))
    val landed = new ParquetStore(spark, landedDir)
    val job = new IngestJob(new ParquetSource(spark, src), landed)
    assert(job.run().isEmpty)
    assert(!landed.exists("currency")) // no empty files land (SURVEY §7.3-8)
  }
}

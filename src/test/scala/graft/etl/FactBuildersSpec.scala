package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Fact-table quirks the reference's tests pin (test/test_transform.py:
  * 132-186): string date/time splits, "unit price" with a space,
  * fact_payment's time column named `last_updated`. */
class FactBuildersSpec extends SparkSpec {

  test("factSalesOrder: 14 cols incl 'unit price', string date/time split") {
    val out = FactBuilders.factSalesOrder(Fixtures.salesOrder(spark))
    assert(out.columns.toSeq === Seq("sales_order_id", "created_date",
      "created_time", "last_updated_date", "last_updated_time",
      "sales_staff_id", "counterparty_id", "units_sold", "unit price",
      "currency_id", "design_id", "agreed_payment_date",
      "agreed_delivery_date", "agreed_delivery_location_id"))
    val r = out.filter(col("sales_order_id") === 1).collect()(0)
    assert(r.getString(1) === "2023-01-01") // created_date as string
    assert(r.getString(2) === "10:00:00")   // created_time as string
    assert(r.getString(11) === "2023-01-01") // agreed_payment_date passthrough
    assert(out.schema("created_date").dataType.typeName === "string")
    assert(out.schema("unit price").dataType.typeName === "decimal(10,2)")
  }

  test("factPurchaseOrder: 14 cols, passthrough item fields") {
    val out = FactBuilders.factPurchaseOrder(Fixtures.purchaseOrder(spark))
    assert(out.columns.toSeq === Seq("purchase_order_id", "created_date",
      "created_time", "last_updated_date", "last_updated_time", "staff_id",
      "counterparty_id", "item_code", "item_quantity", "item_unit_price",
      "currency_id", "agreed_delivery_date", "agreed_payment_date",
      "agreed_delivery_location_id"))
    assert(out.count() === 6)
  }

  test("factPayment: 12 cols, time col (mis)named last_updated") {
    val out = FactBuilders.factPayment(Fixtures.payment(spark))
    assert(out.columns.toSeq === Seq("payment_id", "created_date",
      "created_time", "last_updated_date", "last_updated", "transaction_id",
      "counterparty_id", "payment_amount", "currency_id", "payment_type_id",
      "paid", "payment_date"))
    val r = out.filter(col("payment_id") === 1).collect()(0)
    assert(r.getString(4) === "10:00:00") // the quirky `last_updated` time
    assert(r.getBoolean(10) === false)
    assert(r.getString(11) === "2023-01-01") // payment_date stays string
  }

  test("fractional seconds kept by the split (pandas str() parity)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val ts = java.sql.Timestamp.valueOf("2023-05-05 12:34:56.123456")
    val df = spark.createDataFrame(Seq(
      Row(1, 1, 1, 1, 10, new java.math.BigDecimal("1.00").setScale(2), 1,
        "2023-01-01", "2023-01-01", 1, ts, ts)).asJava, Schemas.salesOrder)
    val r = FactBuilders.factSalesOrder(df).collect()(0)
    assert(r.getString(1) === "2023-05-05")
    assert(r.getString(2) === "12:34:56.123456")
  }
}

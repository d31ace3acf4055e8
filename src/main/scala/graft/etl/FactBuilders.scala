package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact builders T11–T13 (SURVEY.md §2.3): narrow per-row transforms — no
  * shuffle at any scale; whole-stage codegen end to end.
  *
  * Bit-parity quirks preserved from the reference (SURVEY.md §7.3):
  *  - created/last_updated are split into date/time STRINGS exactly as
  *    pandas `str(ts).split(" ")` renders them (fractional seconds kept if
  *    present) — reference: src/transform.py:171-176;
  *  - fact_sales_order has a column literally named "unit price" (with a
  *    space) — reference: src/transform.py:180;
  *  - fact_payment's last-updated TIME column is named `last_updated`, not
  *    `last_updated_time` — reference: src/transform.py:225;
  *  - `agreed_*_date` / `payment_date` pass through as strings (§1.2).
  */
object FactBuilders {

  /** `str(ts).split(" ")[i]` parity: Spark's timestamp→string cast renders
    * `yyyy-MM-dd HH:mm:ss[.SSSSSS]` like pandas' str(). */
  private def datePart(c: Column): Column =
    split(c.cast("string"), " ").getItem(0)
  private def timePart(c: Column): Column =
    split(c.cast("string"), " ").getItem(1)

  /** T11 — fact_sales_order, 14 columns.
    * Reference: src/transform.py:164-186. Surrogate key `sales_record_id`
    * is deliberately NOT generated (warehouse SERIAL identity — reference:
    * src/transform.py:169, setup_test_warehouse.sql:65). */
  def factSalesOrder(salesOrder: DataFrame): DataFrame =
    salesOrder.select(
      col("sales_order_id"),
      datePart(col("created_at")).as("created_date"),
      timePart(col("created_at")).as("created_time"),
      datePart(col("last_updated")).as("last_updated_date"),
      timePart(col("last_updated")).as("last_updated_time"),
      col("staff_id").as("sales_staff_id"),
      col("counterparty_id"),
      col("units_sold"),
      col("unit_price").as("unit price"),
      col("currency_id"),
      col("design_id"),
      col("agreed_payment_date"),
      col("agreed_delivery_date"),
      col("agreed_delivery_location_id"))

  /** T12 — fact_purchase_order, 14 columns.
    * Reference: src/transform.py:189-212. */
  def factPurchaseOrder(purchaseOrder: DataFrame): DataFrame =
    purchaseOrder.select(
      col("purchase_order_id"),
      datePart(col("created_at")).as("created_date"),
      timePart(col("created_at")).as("created_time"),
      datePart(col("last_updated")).as("last_updated_date"),
      timePart(col("last_updated")).as("last_updated_time"),
      col("staff_id"),
      col("counterparty_id"),
      col("item_code"),
      col("item_quantity"),
      col("item_unit_price"),
      col("currency_id"),
      col("agreed_delivery_date"),
      col("agreed_payment_date"),
      col("agreed_delivery_location_id"))

  /** T13 — fact_payment, 12 columns; the time part of last_updated is
    * (mis)named `last_updated` for parity. Reference: src/transform.py:215-235. */
  def factPayment(payment: DataFrame): DataFrame =
    payment.select(
      col("payment_id"),
      datePart(col("created_at")).as("created_date"),
      timePart(col("created_at")).as("created_time"),
      datePart(col("last_updated")).as("last_updated_date"),
      timePart(col("last_updated")).as("last_updated"),
      col("transaction_id"),
      col("counterparty_id"),
      col("payment_amount"),
      col("currency_id"),
      col("payment_type_id"),
      col("paid"),
      col("payment_date"))
}

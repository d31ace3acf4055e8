package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the 11 source OLTP tables ("totesys") and the
  * warehouse star schema. The reference infers these at runtime from cursor
  * metadata / parquet round-trips (reference: src/extract.py:98-101,
  * extraction_test_db/test_db_setup/setup_test_db.sql:7-124); we declare
  * them so empty/partial increments never mis-infer (SURVEY.md §1.3).
  *
  * `agreed_*_date` / `payment_date` are TEXT in the source DDL
  * (setup_test_db.sql:87-88, :102-103, :72) and stay strings through the
  * fact tables; the warehouse sink casts them (SURVEY.md §1.2).
  */
object Schemas {

  private def ts(fields: StructField*): StructType =
    StructType(fields :+
      StructField("created_at", TimestampType) :+
      StructField("last_updated", TimestampType))

  private def f(name: String, t: DataType, nullable: Boolean = true) =
    StructField(name, t, nullable)

  val money: DecimalType = DecimalType(10, 2)

  val address: StructType = ts(
    f("address_id", IntegerType, nullable = false),
    f("address_line_1", StringType), f("address_line_2", StringType),
    f("district", StringType), f("city", StringType),
    f("postal_code", StringType), f("country", StringType),
    f("phone", StringType))

  val counterparty: StructType = ts(
    f("counterparty_id", IntegerType, nullable = false),
    f("counterparty_legal_name", StringType),
    f("legal_address_id", IntegerType),
    f("commercial_contact", StringType), f("delivery_contact", StringType))

  val currency: StructType = ts(
    f("currency_id", IntegerType, nullable = false),
    f("currency_code", StringType))

  val department: StructType = ts(
    f("department_id", IntegerType, nullable = false),
    f("department_name", StringType), f("location", StringType),
    f("manager", StringType))

  val design: StructType = ts(
    f("design_id", IntegerType, nullable = false),
    f("design_name", StringType), f("file_location", StringType),
    f("file_name", StringType))

  val paymentType: StructType = ts(
    f("payment_type_id", IntegerType, nullable = false),
    f("payment_type_name", StringType))

  val payment: StructType = ts(
    f("payment_id", IntegerType, nullable = false),
    f("transaction_id", IntegerType), f("counterparty_id", IntegerType),
    f("payment_amount", money), f("currency_id", IntegerType),
    f("payment_type_id", IntegerType), f("paid", BooleanType),
    f("payment_date", StringType), f("company_ac_number", IntegerType),
    f("counterparty_ac_number", IntegerType))

  val purchaseOrder: StructType = ts(
    f("purchase_order_id", IntegerType, nullable = false),
    f("staff_id", IntegerType), f("counterparty_id", IntegerType),
    f("item_code", StringType), f("item_quantity", IntegerType),
    f("item_unit_price", money), f("currency_id", IntegerType),
    f("agreed_delivery_date", StringType),
    f("agreed_payment_date", StringType),
    f("agreed_delivery_location_id", IntegerType))

  val salesOrder: StructType = ts(
    f("sales_order_id", IntegerType, nullable = false),
    f("design_id", IntegerType), f("staff_id", IntegerType),
    f("counterparty_id", IntegerType), f("units_sold", IntegerType),
    f("unit_price", money), f("currency_id", IntegerType),
    f("agreed_delivery_date", StringType),
    f("agreed_payment_date", StringType),
    f("agreed_delivery_location_id", IntegerType))

  val staff: StructType = ts(
    f("staff_id", IntegerType, nullable = false),
    f("first_name", StringType), f("last_name", StringType),
    f("department_id", IntegerType), f("email_address", StringType))

  val transaction: StructType = ts(
    f("transaction_id", IntegerType, nullable = false),
    f("transaction_type", StringType),
    f("sales_order_id", IntegerType), f("purchase_order_id", IntegerType))

  /** The 11 source tables in the reference's discovery order. */
  val sourceTables: Map[String, StructType] = Map(
    "address" -> address, "counterparty" -> counterparty,
    "currency" -> currency, "department" -> department,
    "design" -> design, "payment_type" -> paymentType,
    "payment" -> payment, "purchase_order" -> purchaseOrder,
    "sales_order" -> salesOrder, "staff" -> staff,
    "transaction" -> transaction)
}

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

  // --------------------------------------------------------------------
  // Warehouse star schema (SURVEY.md §1.3). The reference DDL
  // (setup_test_warehouse.sql:8-80) declares dim_date/dim_staff/
  // dim_location/dim_currency/dim_design/dim_counterparty/
  // fact_sales_order; the remaining dims/facts follow the same
  // conventions. Spark has no TIME type, so `*_time` columns are
  // "HH:mm:ss" strings (matching the reference's transform output —
  // src/transform.py:171-176); `date`-typed columns are DateType, which
  // the sink casts from the transform-stage strings (the explicit form
  // of the reference's DB-side implicit string→date cast at load).
  // SERIAL surrogate keys (sales_record_id etc.) stay DB-side identity
  // columns and are not part of the appended frame (transform.py:169).

  val dimDate: StructType = StructType(Seq(
    f("date_id", DateType, nullable = false),
    f("year", IntegerType, nullable = false),
    f("month", IntegerType, nullable = false),
    f("day", IntegerType, nullable = false),
    f("day_of_week", IntegerType, nullable = false),
    f("day_name", StringType, nullable = false),
    f("month_name", StringType, nullable = false),
    f("quarter", IntegerType, nullable = false)))

  val dimStaff: StructType = StructType(Seq(
    f("staff_id", IntegerType, nullable = false),
    f("first_name", StringType, nullable = false),
    f("last_name", StringType, nullable = false),
    f("department_name", StringType, nullable = false),
    f("location", StringType, nullable = false),
    f("email_address", StringType, nullable = false)))

  val dimLocation: StructType = StructType(Seq(
    f("location_id", IntegerType, nullable = false),
    f("address_line_1", StringType, nullable = false),
    f("address_line_2", StringType),
    f("district", StringType),
    f("city", StringType, nullable = false),
    f("postal_code", StringType, nullable = false),
    f("country", StringType, nullable = false),
    f("phone", StringType, nullable = false)))

  val dimCurrency: StructType = StructType(Seq(
    f("currency_id", IntegerType, nullable = false),
    f("currency_code", StringType, nullable = false),
    f("currency_name", StringType, nullable = false)))

  val dimDesign: StructType = StructType(Seq(
    f("design_id", IntegerType, nullable = false),
    f("design_name", StringType, nullable = false),
    f("file_location", StringType, nullable = false),
    f("file_name", StringType, nullable = false)))

  val dimCounterparty: StructType = StructType(Seq(
    f("counterparty_id", IntegerType, nullable = false),
    f("counterparty_legal_name", StringType, nullable = false),
    f("counterparty_legal_address_line_1", StringType, nullable = false),
    f("counterparty_legal_address_line_2", StringType),
    f("counterparty_legal_district", StringType),
    f("counterparty_legal_city", StringType, nullable = false),
    f("counterparty_legal_postal_code", StringType, nullable = false),
    f("counterparty_legal_country", StringType, nullable = false),
    f("counterparty_legal_phone_number", StringType, nullable = false)))

  val dimTransaction: StructType = StructType(Seq(
    f("transaction_id", IntegerType, nullable = false),
    f("transaction_type", StringType, nullable = false),
    f("sales_order_id", IntegerType),
    f("purchase_order_id", IntegerType)))

  val dimPaymentType: StructType = StructType(Seq(
    f("payment_type_id", IntegerType, nullable = false),
    f("payment_type_name", StringType, nullable = false)))

  val factSalesOrder: StructType = StructType(Seq(
    f("sales_order_id", IntegerType, nullable = false),
    f("created_date", DateType, nullable = false),
    f("created_time", StringType, nullable = false),
    f("last_updated_date", DateType, nullable = false),
    f("last_updated_time", StringType, nullable = false),
    f("sales_staff_id", IntegerType, nullable = false),
    f("counterparty_id", IntegerType, nullable = false),
    f("units_sold", IntegerType, nullable = false),
    f("unit price", money, nullable = false),
    f("currency_id", IntegerType, nullable = false),
    f("design_id", IntegerType, nullable = false),
    f("agreed_payment_date", DateType, nullable = false),
    f("agreed_delivery_date", DateType, nullable = false),
    f("agreed_delivery_location_id", IntegerType, nullable = false)))

  val factPurchaseOrder: StructType = StructType(Seq(
    f("purchase_order_id", IntegerType, nullable = false),
    f("created_date", DateType, nullable = false),
    f("created_time", StringType, nullable = false),
    f("last_updated_date", DateType, nullable = false),
    f("last_updated_time", StringType, nullable = false),
    f("staff_id", IntegerType, nullable = false),
    f("counterparty_id", IntegerType, nullable = false),
    f("item_code", StringType, nullable = false),
    f("item_quantity", IntegerType, nullable = false),
    f("item_unit_price", money, nullable = false),
    f("currency_id", IntegerType, nullable = false),
    f("agreed_delivery_date", DateType, nullable = false),
    f("agreed_payment_date", DateType, nullable = false),
    f("agreed_delivery_location_id", IntegerType, nullable = false)))

  val factPayment: StructType = StructType(Seq(
    f("payment_id", IntegerType, nullable = false),
    f("created_date", DateType, nullable = false),
    f("created_time", StringType, nullable = false),
    f("last_updated_date", DateType, nullable = false),
    f("last_updated", StringType, nullable = false),
    f("transaction_id", IntegerType, nullable = false),
    f("counterparty_id", IntegerType, nullable = false),
    f("payment_amount", money, nullable = false),
    f("currency_id", IntegerType, nullable = false),
    f("payment_type_id", IntegerType, nullable = false),
    f("paid", BooleanType, nullable = false),
    f("payment_date", DateType, nullable = false)))

  /** The warehouse tables the load stage appends. */
  val warehouseTables: Map[String, StructType] = Map(
    "dim_date" -> dimDate, "dim_staff" -> dimStaff,
    "dim_location" -> dimLocation, "dim_currency" -> dimCurrency,
    "dim_design" -> dimDesign, "dim_counterparty" -> dimCounterparty,
    "dim_transaction" -> dimTransaction,
    "dim_payment_type" -> dimPaymentType,
    "fact_sales_order" -> factSalesOrder,
    "fact_purchase_order" -> factPurchaseOrder,
    "fact_payment" -> factPayment)

  /** Natural key of each warehouse table — the first declared column in
    * this star schema by convention (date_id, staff_id, …,
    * sales_order_id). The [EXT] upsert sink mode matches on it; the
    * parity default (Append) never reads it. */
  val warehouseKeys: Map[String, Seq[String]] =
    warehouseTables.map { case (n, st) => n -> Seq(st.fields.head.name) }

  /** Conform a transform-stage frame to its declared warehouse schema:
    * select the declared columns in declared order and cast each to its
    * warehouse type (string→date for `agreed_*_date`/`payment_date`/
    * `created_date`, long→int for the generated date parts). Unknown
    * tables pass through untouched. Nullability is documentation here —
    * the warehouse DDL enforces it. */
  def conformToWarehouse(name: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    warehouseTables.get(name) match {
      case Some(schema) =>
        df.select(schema.fields.toSeq.map(fd =>
          df(fd.name).cast(fd.dataType).as(fd.name)): _*)
      case None => df
    }
}

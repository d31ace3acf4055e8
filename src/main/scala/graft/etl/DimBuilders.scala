package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension builders T1–T10 (SURVEY.md §2.3) as lazy DataFrame plans.
  *
  * Each mirrors one reference `create_dim_*` (reference:
  * src/transform.py:46-161) but is a declarative column-algebra plan:
  * Catalyst prunes the source scan to exactly the projected columns and
  * picks broadcast-hash for the two dim joins (both sides are dimension
  * sized; at 100 TB the fact tables never pass through these builders).
  */
object DimBuilders {

  /** T1+T2 — generated date dimension with ISO day-of-week.
    * Reference: src/transform.py:46-61 (pd.date_range, isocalendar().day).
    * Spark: explode(sequence(...)) — a generator, no driver-side loop; the
    * frame is tiny (one row/day) and broadcast-joinable by construction.
    * `weekday()` is 0=Mon..6=Sun, so ISO dow = weekday+1.
    */
  def dimDate(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    val d = col("date_id")
    spark.range(1).select(
        explode(sequence(
          to_date(lit(startDate)), to_date(lit(endDate)),
          expr("interval 1 day"))).as("date_id"))
      .select(
        d,
        year(d).cast("long").as("year"),
        month(d).cast("long").as("month"),
        dayofmonth(d).cast("long").as("day"),
        (weekday(d) + 1).cast("long").as("day_of_week"),
        date_format(d, "EEEE").as("day_name"),
        date_format(d, "MMMM").as("month_name"),
        quarter(d).cast("long").as("quarter"))
  }

  /** T3 — dim_location: 8-col projection + rename address_id→location_id.
    * Reference: src/transform.py:64-77. */
  def dimLocation(address: DataFrame): DataFrame =
    address.select(
      col("address_id").as("location_id"),
      col("address_line_1"), col("address_line_2"), col("district"),
      col("city"), col("postal_code"), col("country"), col("phone"))

  /** T4 — dim_design projection. Reference: src/transform.py:80-89. */
  def dimDesign(design: DataFrame): DataFrame =
    design.select("design_id", "design_name", "file_location", "file_name")

  /** T5 — dim_currency CASE WHEN; default is the string "0" for unmapped
    * codes (np.select default — reference: src/transform.py:92-105). */
  def dimCurrency(currency: DataFrame): DataFrame =
    currency.select(
      col("currency_id"), col("currency_code"),
      when(col("currency_code") === "GBP", "British Pound Sterling")
        .when(col("currency_code") === "USD", "United States Dollar")
        .when(col("currency_code") === "EUR", "Euro")
        .otherwise("0").as("currency_name"))

  /** T6 — dim_counterparty: inner equi-join on differently-named keys,
    * projecting identity from counterparty and address fields from address.
    * Reference: src/transform.py:108-123 (intended-join semantics per
    * SURVEY.md §2.3 T6 — the pandas index-alignment quirk is a bug, the
    * tests assert the plain join). Address is the smaller side → broadcast.
    */
  def dimCounterparty(address: DataFrame, counterparty: DataFrame): DataFrame =
    counterparty
      .join(broadcast(address),
        counterparty("legal_address_id") === address("address_id"), "inner")
      .select(
        col("counterparty_id"), col("counterparty_legal_name"),
        col("address_line_1").as("counterparty_legal_address_line_1"),
        col("address_line_2").as("counterparty_legal_address_line_2"),
        col("district").as("counterparty_legal_district"),
        col("city").as("counterparty_legal_city"),
        col("postal_code").as("counterparty_legal_postal_code"),
        col("country").as("counterparty_legal_country"),
        col("phone").as("counterparty_legal_phone_number"))

  /** T7+T8 — dim_staff: equi-join on department_id + ordered by staff_id
    * (the repo's only explicit sort). Reference: src/transform.py:126-139. */
  def dimStaff(staff: DataFrame, department: DataFrame): DataFrame =
    staff
      .join(broadcast(department), Seq("department_id"), "inner")
      .select("staff_id", "first_name", "last_name", "department_name",
        "location", "email_address")
      .orderBy("staff_id")

  /** T9 — dim_transaction projection; FK columns stay nullable ints (Spark
    * keeps proper nulls where pandas degraded to NaN/float).
    * Reference: src/transform.py:142-151. */
  def dimTransaction(transaction: DataFrame): DataFrame =
    transaction.select("transaction_id", "transaction_type",
      "sales_order_id", "purchase_order_id")

  /** T10 — dim_payment_type projection. Reference: src/transform.py:154-161. */
  def dimPaymentType(paymentType: DataFrame): DataFrame =
    paymentType.select("payment_type_id", "payment_type_name")
}

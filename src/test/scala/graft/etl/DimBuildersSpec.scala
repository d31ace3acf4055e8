package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Transform-stage dimension semantics, mirroring the reference's
  * test/test_transform.py assertions (golden dim_date rows, currency
  * default '0', counterparty join, staff sort). */
class DimBuildersSpec extends SparkSpec {

  test("dimDate: inclusive range, parts, ISO day-of-week golden rows") {
    val dd = DimBuilders.dimDate(spark, "2022-01-01", "2024-01-01")
    assert(dd.count() === 731) // 365 + 365 + 1, both endpoints inclusive
    assert(dd.columns.toSeq === Seq("date_id", "year", "month", "day",
      "day_of_week", "day_name", "month_name", "quarter"))

    // golden oracle from the reference's load_test_db fixture:
    // 2023-03-26 is a Sunday (ISO dow 7), 2023-03-27 a Monday (ISO dow 1)
    val golden = dd
      .filter(col("date_id").between("2023-03-26", "2023-03-27"))
      .orderBy("date_id")
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6), r.getLong(7)))
    assert(golden === Array(
      ("2023-03-26", 2023L, 3L, 26L, 7L, "Sunday", "March", 1L),
      ("2023-03-27", 2023L, 3L, 27L, 1L, "Monday", "March", 1L)))
  }

  test("dimCurrency: CASE WHEN mapping with string '0' default") {
    val out = DimBuilders.dimCurrency(Fixtures.currency(spark))
    assert(out.columns.toSeq === Seq("currency_id", "currency_code", "currency_name"))
    // seed codes AAA/BBB/CCC are unmapped -> all '0' (np.select default)
    assert(cells(out) === Set(
      Seq(1, "AAA", "0"), Seq(2, "BBB", "0"), Seq(3, "CCC", "0")))

    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val mapped = DimBuilders.dimCurrency(spark.createDataFrame(Seq(
      Row(10, "GBP", Fixtures.t0, Fixtures.t0),
      Row(11, "USD", Fixtures.t0, Fixtures.t0),
      Row(12, "EUR", Fixtures.t0, Fixtures.t0)).asJava, Schemas.currency))
    assert(cells(mapped) === Set(
      Seq(10, "GBP", "British Pound Sterling"),
      Seq(11, "USD", "United States Dollar"),
      Seq(12, "EUR", "Euro")))
  }

  test("dimLocation: projection + rename") {
    val out = DimBuilders.dimLocation(Fixtures.address(spark))
    assert(out.columns.toSeq === Seq("location_id", "address_line_1",
      "address_line_2", "district", "city", "postal_code", "country", "phone"))
    assert(out.count() === 5)
    val r1 = out.filter(col("location_id") === 1).collect()(0)
    assert(r1.toSeq === Seq(1, "al1-a", "al2-a", "district-a", "city-a",
      "11111", "country-a", "0000 000001"))
  }

  test("dimCounterparty: join on legal_address_id, shared address fanout") {
    val out = DimBuilders.dimCounterparty(
      Fixtures.address(spark), Fixtures.counterparty(spark))
    assert(out.columns.toSeq === Seq("counterparty_id",
      "counterparty_legal_name", "counterparty_legal_address_line_1",
      "counterparty_legal_address_line_2", "counterparty_legal_district",
      "counterparty_legal_city", "counterparty_legal_postal_code",
      "counterparty_legal_country", "counterparty_legal_phone_number"))
    assert(out.count() === 4)
    // counterparties 3 and 4 share legal_address_id=3 -> both carry address c
    val shared = out.filter(col("counterparty_id").isin(3, 4))
      .select("counterparty_legal_city").distinct().collect().map(_.getString(0))
    assert(shared.toSeq === Seq("city-c"))
  }

  test("dimStaff: department join + sort by staff_id") {
    val out = DimBuilders.dimStaff(Fixtures.staff(spark), Fixtures.department(spark))
    assert(out.columns.toSeq === Seq("staff_id", "first_name", "last_name",
      "department_name", "location", "email_address"))
    assert(sortedCells(out) === Seq(
      Seq(1, "fn-a", "ln-a", "dept-a", "loc-a", "fna.lna@terrifictotes.com"),
      Seq(2, "fn-b", "ln-b", "dept-b", "loc-b", "fnb.lnb@terrifictotes.com"),
      Seq(3, "fn-c", "ln-c", "dept-c", "loc-c", "fnc.lnc@terrifictotes.com")))
  }

  test("dimTransaction: nullable FK columns keep proper nulls") {
    val out = DimBuilders.dimTransaction(Fixtures.transaction(spark))
    assert(out.columns.toSeq === Seq("transaction_id", "transaction_type",
      "sales_order_id", "purchase_order_id"))
    val r1 = out.filter(col("transaction_id") === 1).collect()(0)
    assert(r1.isNullAt(2) && r1.getInt(3) === 1)
    val r2 = out.filter(col("transaction_id") === 2).collect()(0)
    assert(r2.getInt(2) === 1 && r2.isNullAt(3))
  }

  test("dimDesign and dimPaymentType projections") {
    val d = DimBuilders.dimDesign(Fixtures.design(spark))
    assert(d.columns.toSeq === Seq("design_id", "design_name",
      "file_location", "file_name") && d.count() === 6)
    val p = DimBuilders.dimPaymentType(Fixtures.paymentType(spark))
    assert(p.columns.toSeq === Seq("payment_type_id", "payment_type_name")
      && p.count() === 4)
  }
}

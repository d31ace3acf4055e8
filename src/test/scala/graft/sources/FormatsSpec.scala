package graft.sources

import graft.SparkSpec
import graft.etl.{Fixtures, Schemas}

/** Round-trip parity for the interchange formats against the seeded
  * fixture tables (CSV loses no values with explicit schemas; JSON lines
  * and ORC preserve types). */
class FormatsSpec extends SparkSpec {

  test("CSV round-trip with explicit schema") {
    val dir = tmpDir("csv")
    val src = Fixtures.staff(spark)
    Formats.writeCsv(src, s"$dir/staff")
    val back = Formats.readCsv(spark, s"$dir/staff", Schemas.staff)
    assert(cells(back) === cells(src))
    // file readers relax nullability; names and types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Schemas.staff.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("JSON lines round-trip preserves nulls and decimals") {
    val dir = tmpDir("json")
    val src = Fixtures.transaction(spark) // nullable FK ints
    Formats.writeJsonLines(src, s"$dir/transaction")
    val back = Formats.readJsonLines(spark, s"$dir/transaction", Schemas.transaction)
    assert(cells(back) === cells(src))
    val pay = Fixtures.payment(spark) // decimal(10,2) amounts
    Formats.writeJsonLines(pay, s"$dir/payment")
    val payBack = Formats.readJsonLines(spark, s"$dir/payment", Schemas.payment)
    assert(cells(payBack) === cells(pay))
  }

  test("ORC round-trip preserves the full schema") {
    val dir = tmpDir("orc")
    val src = Fixtures.payment(spark)
    Formats.writeOrc(src, s"$dir/payment")
    val back = Formats.readOrc(spark, s"$dir/payment", Schemas.payment)
    assert(cells(back) === cells(src))
    assert(back.schema("payment_amount").dataType.typeName === "decimal(10,2)")
  }
}

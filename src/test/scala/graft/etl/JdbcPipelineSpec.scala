package graft.etl

import java.sql.DriverManager
import java.util.Properties
import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The reference's end-to-end scenario with a real database on BOTH ends
  * (test_end_to_end.py:77-113 shape): seed an embedded-Derby OLTP, run
  * extract→transform→load into a SEPARATE Derby warehouse DB, UPDATE a
  * payment, run again, and assert the warehouse accumulated a new version
  * row. Source tables are created QUOTED (lowercase) so the reference's
  * reserved-word table name `transaction` works verbatim. */
class JdbcPipelineSpec extends SparkSpec {

  private val oltpUrl = "jdbc:derby:memory:graftpipe_oltp;create=true"
  private val whUrl = "jdbc:derby:memory:graftpipe_wh;create=true"
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("extract(jdbc) -> transform -> load(jdbc), then update re-captured") {
    // seed the OLTP side from the fixture frames (JDBC write creates
    // tables; names quoted to keep exact case + allow reserved words)
    Fixtures.all(spark).foreach { case (name, df) =>
      df.write.mode("append").jdbc(oltpUrl, "\"" + name + "\"", props)
    }

    val landed = new ParquetStore(spark, tmpDir("jp-landed"))
    val processed = new ParquetStore(spark, tmpDir("jp-processed"))
    val source = new JdbcSource(spark, oltpUrl, props,
      catalogQuery = JdbcSource.derbyCatalogQuery)
    val sink = new JdbcWarehouseSink(whUrl, props)

    def runAll(): Unit = {
      new IngestJob(source, landed).run()
      new TransformJob(landed, processed).run(spark)
      processed.list().foreach(t => sink.append(t, processed.read(t)))
    }

    runAll()
    val factPayment1 = spark.read.jdbc(whUrl, "fact_payment", props)
    assert(factPayment1.count() === 6)
    assert(spark.read.jdbc(whUrl, "dim_date", props).count() === 731)
    assert(spark.read.jdbc(whUrl, "dim_staff", props).count() === 3)

    // warehouse columns land TYPED per Schemas.warehouseTables — the sink
    // casts the transform-stage strings (setup_test_warehouse.sql:8-80)
    import org.apache.spark.sql.types._
    val fsoTypes = spark.read.jdbc(whUrl, "fact_sales_order", props)
      .schema.fields.map(fd => fd.name -> fd.dataType).toMap
    assert(fsoTypes("agreed_payment_date") === DateType)
    assert(fsoTypes("agreed_delivery_date") === DateType)
    assert(fsoTypes("created_date") === DateType)
    assert(fsoTypes("created_time") === StringType)
    assert(fsoTypes("unit price") === DecimalType(10, 2))
    assert(fsoTypes("units_sold") === IntegerType)
    val payTypes = factPayment1.schema.fields.map(fd => fd.name -> fd.dataType).toMap
    assert(payTypes("payment_date") === DateType)
    assert(payTypes("paid") === BooleanType)
    val ddTypes = spark.read.jdbc(whUrl, "dim_date", props)
      .schema.fields.map(fd => fd.name -> fd.dataType).toMap
    assert(ddTypes("date_id") === DateType)
    assert(ddTypes("year") === IntegerType)

    // UPDATE payment 3 with a later last_updated, as the reference e2e does
    val conn = DriverManager.getConnection(oltpUrl)
    val st = conn.createStatement()
    st.executeUpdate(
      """UPDATE "payment" SET "payment_amount" = 77.70,
        |  "last_updated" = '2023-06-01 09:30:00'
        |WHERE "payment_id" = 3""".stripMargin)
    st.close(); conn.close()

    runAll()
    val factPayment2 = spark.read.jdbc(whUrl, "fact_payment", props)
    // append-only warehouse: the updated payment is a NEW version row
    assert(factPayment2.count() === 7)
    val versions = factPayment2.filter(col("payment_id") === 3)
    assert(versions.count() === 2)
    assert(versions.filter(col("payment_amount") === 77.70).count() === 1)
    // and ONLY the delta flowed: landed payment table holds exactly 1 row
    assert(landed.read("payment").count() === 1)
  }
}

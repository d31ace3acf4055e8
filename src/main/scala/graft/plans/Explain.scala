package graft.plans

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of any registered gate
  * query (`sbt "runMain graft.plans.Explain q04_revenue_by_nation
  * [sfDir]"`) — the `.explain("formatted")` iteration loop for checking
  * PushedFilters / ReadSchema / broadcast / codegen spans by eye; the
  * machine-checked subset lives in PlanAuditSpec. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.allQueries.find(_.name == name) match {
      case Some(q) => q.run(spark, sfDir).explain("formatted")
      case None =>
        System.err.println(s"unknown query '$name'; available:\n" +
          graft.SparkEntry.allQueries.map(_.name).sorted.mkString("\n"))
    }
    spark.stop()
  }
}

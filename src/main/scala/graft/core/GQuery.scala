package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract
  * (`SparkEntry.queries` / `SparkEntry.oracleSql`).
  *
  * @param name   stable query id (drives output dir + oracle key)
  * @param run    Spark plan builder over the testdata dir
  * @param oracle equivalent ANSI SQL for the DuckDB oracle; None for
  *               ops not expressible in SQL (driver falls back to a
  *               rows-only check — such queries must return rows > 0)
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  /** Query with a DuckDB oracle. */
  def apply(name: String, sql: String)(
      run: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, run, Some(sql))

  /** Query with only the weaker rows-only check. */
  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, run, None)
}

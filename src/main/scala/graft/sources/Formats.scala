package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format table IO beyond parquet: CSV, JSON lines, ORC. Schema is
  * always explicit on read (schema-on-read inference is banned for the
  * same reason as the ETL layer's — empty or partial files must not
  * change types; SURVEY.md §1.3).
  *
  * At scale all three read/write through the same distributed
  * FileFormat machinery as parquet (splittable reads except
  * single-object JSON, partition-parallel writes); parquet remains the
  * engine's at-rest format — these exist for interchange at the edges,
  * the role S3 CSV/JSON drops play in ingest pipelines.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}

package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Storage abstraction standing in for the reference's S3 buckets
  * (reference: src/extract.py:122-156 bucket discovery, src/load.py:51-78
  * multi-file ingest). One named parquet table per entry; works against
  * any Hadoop-FS URI (local path in tests, s3a:// on a cluster) — the same
  * path-prefix indirection the reference's tests exploit (SURVEY.md §5).
  */
trait TableStore {
  def exists(name: String): Boolean
  def list(): Seq[String]
  def read(name: String): DataFrame
  def read(name: String, schema: StructType): DataFrame
  /** Overwrite-per-table write — extract replaces the per-table object each
    * run (reference: src/extract.py:253). */
  def write(name: String, df: DataFrame): Unit
  /** Append — the warehouse accumulates versions (reference: src/load.py:102-110). */
  def append(name: String, df: DataFrame): Unit
}

/** Parquet-directory store: `<root>/<name>.parquet/` (a parquet dataset per
  * table, so writes scale out across executors instead of the reference's
  * single-buffer upload). */
final class ParquetStore(spark: SparkSession, root: String) extends TableStore {

  private def path(name: String) = s"$root/$name.parquet"

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def exists(name: String): Boolean = fs.exists(new Path(path(name)))

  override def list(): Seq[String] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  override def read(name: String): DataFrame =
    spark.read.parquet(path(name))

  override def read(name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path(name))

  override def write(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(name))

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  /** Hive-style partitioned layout (`<name>.parquet/<col>=<v>/...`): the
    * 100 TB fact-table layout — scans filtered on the partition columns
    * prune whole directories (PartitionFilters, asserted in ScaleSpec). */
  def writePartitioned(name: String, df: DataFrame, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path(name))

  /** Append into a hive-partitioned layout: new files land only under
    * the partition directories the batch actually touches; existing
    * files are never rewritten (the partitioned analogue of [[append]]). */
  def appendPartitioned(name: String, df: DataFrame, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*)
      .parquet(path(name))
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet directory layout
  * (`<dir>/<name>.parquet`, see TESTDATA.md). One DataFrame per named table —
  * the Spark-native analogue of the reference's dict-of-DataFrames pattern
  * (reference: src/extract.py:214, src/load.py:68-73).
  *
  * Scale note: these are plain lazy `spark.read.parquet` scans. Catalyst
  * prunes columns and pushes filters into the parquet reader, so callers
  * should compose projections/filters on the returned frame rather than
  * materializing it.
  */
object Tables {

  /** TPC-H-ish star schema + events stream + LLM-pipeline tables. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Analyzed-relation cache: repeated Tables() calls (80+ gate queries ×
    * up to 10 tables each) would re-list files and re-read parquet footers
    * for schema inference every time — pure per-query constant overhead.
    * A WeakHashMap keyed on the session keeps isolation AND lets stopped
    * sessions (plus every cached plan holding their SessionState) be
    * collected instead of leaking for the JVM lifetime. The cached value
    * is the lazy plan, nothing is materialized.
    *
    * Caveat: the first read's file-listing snapshot is served for the
    * session's lifetime — correct for the immutable driver testdata this
    * registry serves; call [[invalidateCache]] if a directory is rewritten
    * mid-session. */
  private val relationCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = relationCache.synchronized {
      val existing = relationCache.get(spark)
      if (existing != null) existing
      else {
        val m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        relationCache.put(spark, m)
        m
      }
    }
    perSession.getOrElseUpdate((dir, name), build(spark, dir, name))
  }

  /** Drop cached relations for a session (e.g. after rewriting a dir). */
  def invalidateCache(spark: SparkSession): Unit =
    relationCache.synchronized { relationCache.remove(spark) }

  private def build(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read the raw int64 nanos (legacy conf) and convert
      // to a micros timestamp with integer division — `ts div 1000` stays
      // in long arithmetic (a double roundtrip would lose precision above
      // 2^53 ns). DuckDB oracles cast with CAST(ts AS TIMESTAMP) for the
      // same micros truncation.
      //
      // The raw nanos survive as `ts_ns`: predicates on the converted `ts`
      // cannot push through timestamp_micros(), so time-range scans (CDC
      // watermark, partition pruning at scale) must filter on ts_ns — see
      // eventsTsNanos for literal conversion.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      raw.withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path(dir, name))
  }

  /** UTC instant → raw nanos literal for pushdown-friendly filters on
    * events.ts_ns. Sub-second precision is preserved (e.g.
    * "…T00:00:00.5Z" → …500000000 ns). */
  def eventsTsNanos(utcInstant: String): Long = {
    val i = java.time.Instant.parse(utcInstant)
    i.getEpochSecond * 1000000000L + i.getNano
  }

  /** Register every table as a temp view so the same surface is reachable
    * from `spark.sql`. Idempotent. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

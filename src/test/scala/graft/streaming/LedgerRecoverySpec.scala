package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crash-recovery behavior of the streaming replay gates' delivery
  * ledgers: a run that lost its ledger (crash between the state append
  * and the ledger write, or an operator dropping it) must re-drive the
  * production triggers and converge to the SAME output — the cold path
  * re-seeds/rebuilds the state table, so a half-updated keys table from
  * the interrupted run can never leak into the recomputed counts. */
class LedgerRecoverySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Seq[Seq[Any]] =
    sortedCells(graft.SparkEntry.queries(name)(spark, dir))

  /** Current-semantics ledger name — derived through the SAME helper the
    * gates use, so this spec can't silently drift from their naming. */
  private def ledgerFor(prefix: String, semVer: String = "s1"): String =
    graft.core.StreamGates.table(prefix, dir, semVer) + "_dlv"

  test("bloom gate: dropping the ledger forces a cold re-run with identical output") {
    val first = run("stream_bloom_replay")
    val warm = run("stream_bloom_replay") // served from the ledger
    assert(warm === first)
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerFor("graft_bloom_stream_")}")
    val recovered = run("stream_bloom_replay") // cold: re-seed + re-trigger
    assert(recovered === first,
      "post-crash re-run must re-derive the same deliveries and key rows")
  }

  test("a semantics bump can never serve a stale ledger") {
    // The structural property of StreamGates naming: a ledger persisted
    // under a PREVIOUS semantics version lives under a different table
    // name, so the bumped gate takes its cold path instead of serving
    // stale counts. Simulate the pre-bump world: a poisoned ledger under
    // the s0 name must be invisible to the current (s1) gate.
    import spark.implicits._
    val stale = ledgerFor("graft_bloom_stream_", "s0")
    graft.core.Warehouse.reclaimOrphan(spark, stale)
    Seq((0L, 999L)).toDF("doc_id", "n_deliveries")
      .write.mode("overwrite").saveAsTable(stale)
    try {
      val out = run("stream_bloom_replay")
      assert(!out.exists(_.contains(999L)),
        "gate must never read a ledger from another semantics version")
      // and the names the gates actually use carry the version component
      assert(ledgerFor("graft_bloom_stream_").contains("_s1_"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $stale")
  }

  test("band gate: dropping the ledger forces an index reset with identical output") {
    val first = run("stream_banddedup_replay")
    val warm = run("stream_banddedup_replay")
    assert(warm === first)
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerFor("gbsr_")}")
    // the cold path must build() a fresh corpus-only index version —
    // the previous run's appended survivors must not dedup batch 0
    val recovered = run("stream_banddedup_replay")
    assert(recovered === first,
      "post-crash re-run must reset the index and re-derive the same run")
  }

  test("ann gate: dropping the ledger forces an index reset with identical output") {
    val first = run("stream_ann_append_replay")
    val warm = run("stream_ann_append_replay")
    assert(warm === first)
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerFor("gais_")}")
    // the cold path must buildPortable() the corpus-only cells layout —
    // the previous run's appended batches must not survive the reset
    val recovered = run("stream_ann_append_replay")
    assert(recovered === first,
      "post-crash re-run must reset the IVF index and re-derive the same run")
  }

  test("the cold path sweeps retired-version state: tables, orphan dirs, raw store roots") {
    // versioned names are never reused, so Warehouse.reclaimOrphan's
    // name-reuse trigger can't fire for a retired semVer — the cold
    // path's reclaimSiblings sweep is what keeps the warehouse honest
    // across bumps. Plant all three retirement shapes for the gais
    // prefix: a previous-version raw ParquetStore root (never a catalog
    // table), a previous-version ledger CATALOG table, and a
    // pre-versioning bare-name ledger. A bump-forced cold run must
    // remove all three and leave the current-version state live.
    import spark.implicits._
    val stem = graft.core.StreamGates.table("gais_", dir, "x")
      .stripSuffix("_x")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val s0root = new java.io.File(wh, s"${stem}_s0")
    new java.io.File(s0root, "idx_cells").mkdirs()
    val s0Ledger = s"${stem}_s0_dlv"
    Seq((0L, 9L)).toDF("vec_id", "n")
      .write.mode("overwrite").saveAsTable(s0Ledger)
    val legacyLedger = s"${stem}_dlv"
    Seq((0L, 9L)).toDF("vec_id", "n")
      .write.mode("overwrite").saveAsTable(legacyLedger)

    val first = run("stream_ann_append_replay") // current state live
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerFor("gais_")}") // force cold
    val recovered = run("stream_ann_append_replay")
    assert(recovered === first)
    assert(!s0root.exists, "retired raw store root must be deleted")
    assert(!spark.catalog.tableExists(s0Ledger),
      "retired-version ledger table must be dropped")
    assert(!spark.catalog.tableExists(legacyLedger),
      "pre-versioning bare-name ledger must be dropped")
    assert(spark.catalog.tableExists(ledgerFor("gais_")),
      "current-version state must survive the sweep")
  }
}

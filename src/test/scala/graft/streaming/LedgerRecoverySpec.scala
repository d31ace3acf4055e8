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

  private def ledgerFor(prefix: String): String = {
    val crc = new java.util.zip.CRC32()
    crc.update(dir.getBytes("UTF-8"))
    f"$prefix${crc.getValue}%08x_dlv"
  }

  test("bloom gate: dropping the ledger forces a cold re-run with identical output") {
    val first = run("stream_bloom_replay")
    val warm = run("stream_bloom_replay") // served from the ledger
    assert(warm === first)
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerFor("graft_bloom_stream_")}")
    val recovered = run("stream_bloom_replay") // cold: re-seed + re-trigger
    assert(recovered === first,
      "post-crash re-run must re-derive the same deliveries and key rows")
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
}

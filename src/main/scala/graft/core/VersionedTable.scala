package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Versioned physical layout shared by the persisted-state stores
  * ([[graft.operators.BandIndex]], [[graft.streaming.CmsStream]]).
  *
  * Readers and appenders address a state table through a VIEW (`base`)
  * that redirects to the current physical version (`<base>_vN`). This is
  * what makes a compact/rewrite ATOMIC: the rewrite lands fully in
  * v(N+1), then ONE `CREATE OR REPLACE VIEW` retargets readers — there
  * is no instant at which the state name fails to resolve, and a crash
  * mid-rewrite leaves an orphan v(N+1) that stays INVISIBLE (the view
  * still defines the current version) and is overwritten by the re-run.
  * The authoritative current version is parsed from the view's own
  * definition, NOT from a max-suffix listing — an orphan left by a crash
  * must stay invisible to appends until a successful rewrite claims it.
  */
object VersionedTable {

  /** Current version behind `base` (0 = absent, or a pre-versioning
    * physical table squatting on the base name). */
  def versionOf(spark: SparkSession, base: String): Int = {
    val cat = spark.sessionState.catalog
    val id = TableIdentifier(base)
    if (!cat.tableExists(id)) 0
    else cat.getTableMetadata(id).viewText match {
      case Some(sql) =>
        "_v(\\d+)".r.findFirstMatchIn(sql).map(_.group(1).toInt).getOrElse(0)
      case None => 0 // pre-versioning physical table under the base name
    }
  }

  /** The physical table currently behind `base` — what appends write to
    * and what file-listing inspections look at. */
  def physicalTable(spark: SparkSession, base: String): String = {
    val v = versionOf(spark, base)
    if (v == 0) base else s"${base}_v$v"
  }

  /** Read `base` with a fresh file listing. Sessions cache a table's
    * file-list snapshot in their tableRelationCache — and creating the
    * redirect view PRE-POPULATES that cache in the creating session
    * (analyzing `SELECT * FROM base_vN` resolves the table) — so a
    * session would otherwise silently miss files appended by ANY OTHER
    * session. The contract is multi-writer-visible reads; the refresh is
    * an O(#files) metadata op, negligible next to the work it feeds.
    * Without it a compact would be outright destructive after
    * cross-session appends: a stale listing rewrites the state WITHOUT
    * the appended rows. */
  def refreshed(spark: SparkSession, base: String): DataFrame = {
    val physical = physicalTable(spark, base)
    spark.catalog.refreshTable(physical)
    spark.table(physical)
  }

  /** Atomically retarget `base` to version `v` and drop every OTHER
    * versioned physical table (plus a legacy unversioned table, whose
    * name the view takes over). */
  def retarget(spark: SparkSession, base: String, v: Int): Unit = {
    val cat = spark.sessionState.catalog
    val id = TableIdentifier(base)
    if (cat.tableExists(id) && cat.getTableMetadata(id).viewText.isEmpty)
      spark.sql(s"DROP TABLE $base")
    spark.sql(s"CREATE OR REPLACE VIEW $base AS SELECT * FROM ${base}_v$v")
    val prefix = s"${base}_v"
    cat.listTables(cat.getCurrentDatabase).map(_.table)
      .filter(t => t.startsWith(prefix) &&
        t.stripPrefix(prefix).forall(_.isDigit) &&
        t != s"${base}_v$v")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}

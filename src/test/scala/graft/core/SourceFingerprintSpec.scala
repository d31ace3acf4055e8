package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Coverage semantics of the file fingerprint (ADVICE r10 #4): plans
  * with no file-backed leaf must report None so memo layers can refuse
  * plan-hash-only keying, and file-backed plans must change fingerprint
  * when the files change. */
class SourceFingerprintSpec extends SparkSpec {

  import spark.implicits._

  test("a local-relation plan has no coverage") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(SourceFingerprint.ofCovered(df).isEmpty)
    assert(SourceFingerprint.ofCovered(df.filter(col("id") > 0)).isEmpty)
  }

  test("a parquet-backed plan is covered, and a rewrite changes the print") {
    val dir = tmpDir("fp")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val before = SourceFingerprint.ofCovered(spark.read.parquet(dir))
    assert(before.nonEmpty)
    // same content, fresh commit: part-file names are fresh UUIDs, so
    // the fingerprint must move even when sizes/rows coincide
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val after = SourceFingerprint.ofCovered(spark.read.parquet(dir))
    assert(after.nonEmpty)
    assert(before !== after)
  }

  test("of() stays stable for covered plans (compat shim over ofCovered)") {
    val dir = tmpDir("fp2")
    Seq((7L, "z")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(SourceFingerprint.of(df) === SourceFingerprint.ofCovered(df).get)
  }

  test("bloom prefilter stays correct on an uncoverable (local) corpus") {
    // memoization is refused, but the output contract must hold: bloom
    // passes verified by anti-join == plain anti-join
    val corpus = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val batch = Seq(3L, 4L, 5L, 6L).toDF("doc_id")
    val out = graft.operators.Dedup
      .bloomNewKeys(corpus, batch, "doc_id", mBits = 1 << 12, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(5L, 6L))
  }
}

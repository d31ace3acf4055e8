package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership sketch: the no-false-negative
  * contract, a false-positive-rate sanity bound, exactness of the
  * bloom-then-verify new-keys composite, and the broadcast-sized
  * bitmap shape the 100 TB story depends on. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def keys(ids: Seq[Long]) = ids.toDF("doc_id")

  test("no false negatives: every corpus member passes, even saturated") {
    val corpus = keys(0L until 300L)
    // m = 256 bits for 300 keys × 4 hashes — a deliberately saturated
    // filter (load ≈ 4.7). False positives abound; false negatives must
    // still be structurally impossible.
    val bloom = Dedup.bloomBuild(corpus, "doc_id", 256, 4)
    val probed = Dedup.bloomProbe(corpus, "doc_id", bloom, 256, 4)
    assert(probed.filter(!col("bloom_pass")).count() === 0L)
  }

  test("false-positive rate is bounded with an adequately sized bitmap") {
    val corpus = keys(0L until 500L)
    val nonMembers = keys(10000L until 12000L)
    // m = 2^16, k = 5, n = 500 → load nk/m ≈ 0.038,
    // fpp ≈ (1 − e^−0.038)^5 ≈ 7e−8 — observed must be ~0; allow 1%.
    val bloom = Dedup.bloomBuild(corpus, "doc_id", 1 << 16, 5)
    val fp = Dedup.bloomProbe(nonMembers, "doc_id", bloom, 1 << 16, 5)
      .filter(col("bloom_pass")).count()
    assert(fp <= 20L, s"false-positive count $fp exceeds 1% of 2000")
  }

  test("bloomNewKeys equals the plain anti-join exactly, with live FPs") {
    // small bitmap so the pass-set contains real false positives and the
    // verification branch must actually reject them
    val corpus = keys((0L until 400L).filter(_ % 5 != 0))
    val batch = keys(0L until 600L)
    val viaBloom = Dedup.bloomNewKeys(corpus, batch, "doc_id", 512, 4)
    val plain = batch.join(corpus, Seq("doc_id"), "left_anti")
    assert(cells(viaBloom) === cells(plain))
    // the filter IS saturated enough to send false positives to verify:
    val bloom = Dedup.bloomBuild(corpus, "doc_id", 512, 4)
    val fpToVerify = Dedup.bloomProbe(
        batch.join(corpus, Seq("doc_id"), "left_anti"),
        "doc_id", bloom, 512, 4)
      .filter(col("bloom_pass")).count()
    assert(fpToVerify > 0L,
      "test setup expected false positives to exercise the verify branch")
  }

  test("bitmap is one row and at most m/64 map entries") {
    val corpus = keys(0L until 1000L)
    val mBits = 1 << 12
    val bloom = Dedup.bloomBuild(corpus, "doc_id", mBits, 5).collect()
    assert(bloom.length === 1)
    val m = bloom(0).getMap[Long, Long](0)
    assert(m.size <= mBits / 64)
    assert(m.keys.forall(w => w >= 0 && w < mBits / 64))
  }

  test("bloomBuildCached: value-identical to bloomBuild, survives clearCache as a local frame") {
    val corpus = keys((0L until 400L).filter(_ % 7 != 0))
    // sparse map → expected dense words
    val sparse = Dedup.bloomBuild(corpus, "doc_id", 2048, 5).collect()(0)
      .getMap[Long, Long](0).toMap
    val direct = (0L until 2048 / 64).map(w => sparse.getOrElse(w, 0L))
    def denseOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect()(0).getSeq[Long](0)
    val cached1 = Dedup.bloomBuildCached(corpus, "doc_id", 2048, 5)
    assert(denseOf(cached1) === direct)
    // the amortization contract: after a harness-style cache clear, the
    // memoized frame is a LOCAL relation — zero corpus I/O on re-probe
    spark.catalog.clearCache()
    val cached2 = Dedup.bloomBuildCached(corpus, "doc_id", 2048, 5)
    assert(cached2.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "second build must serve the memoized bitmap, not re-scan the corpus:\n"
        + cached2.queryExecution.optimizedPlan.toString)
    assert(denseOf(cached2) === direct)
    // and the composite still equals the plain anti-join after the clear
    val batch = keys(0L until 500L)
    val viaBloom = Dedup.bloomNewKeys(corpus, batch, "doc_id", 2048, 5)
    val plain = batch.join(corpus, Seq("doc_id"), "left_anti")
    assert(cells(viaBloom) === cells(plain))
  }

  test("probe parity: dense array bitmap ≡ sparse map bitmap, verdict for verdict") {
    // the gates probe the DENSE shape (O(1) element_at) while bloomBuild
    // emits the sparse map — every (mBits, k, corpus) draw must give
    // identical per-key verdicts through both representations
    for ((mBits, k, mod) <- Seq((256, 4, 2), (4096, 5, 3), (1 << 15, 6, 7))) {
      val corpus = keys((0L until 300L).filter(_ % mod == 0))
      val batch = keys(0L until 400L)
      val sparse = Dedup.bloomBuild(corpus, "doc_id", mBits, k)
      val dense = Dedup.bloomBuildCached(corpus, "doc_id", mBits, k)
      import org.apache.spark.sql.types.{ArrayType, MapType}
      assert(sparse.schema("bloom").dataType.isInstanceOf[MapType])
      assert(dense.schema("bloom").dataType.isInstanceOf[ArrayType])
      def verdicts(bloom: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
        Dedup.bloomProbe(batch, "doc_id", bloom, mBits, k)
          .select("doc_id", "bloom_pass").collect()
          .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(verdicts(dense) === verdicts(sparse),
        s"dense/sparse divergence at mBits=$mBits k=$k mod=$mod")
    }
  }

  test("memo invalidation: rewriting the corpus dir yields fresh verdicts in-session") {
    // The memo key fingerprints the corpus FILES, not just the plan: two
    // reads of the same path hash identically as plans, so without the
    // fingerprint the second bloomNewKeys below would probe the FIRST
    // corpus's bitmap — and its false negatives skip the verify join,
    // silently emitting rows that are NOT new under the rewritten corpus.
    val dir = tmpDir("bloom-rewrite")
    keys((0L until 400L).filter(_ % 2 == 0)).write.mode("overwrite").parquet(dir)
    val corpus1 = spark.read.parquet(dir)
    val batch = keys(0L until 500L)
    val first = Dedup.bloomNewKeys(corpus1, batch, "doc_id", 2048, 5)
    assert(cells(first) === cells(batch.join(corpus1, Seq("doc_id"), "left_anti")))

    // rewrite the SAME path with the complementary key set and re-read
    keys((0L until 400L).filter(_ % 2 == 1)).write.mode("overwrite").parquet(dir)
    val corpus2 = spark.read.parquet(dir)
    assert(corpus1.semanticHash() === corpus2.semanticHash(),
      "precondition: the plan hash alone cannot distinguish the rewrite")
    val second = Dedup.bloomNewKeys(corpus2, batch, "doc_id", 2048, 5)
    val expected = batch.join(
      keys((0L until 400L).filter(_ % 2 == 1)), Seq("doc_id"), "left_anti")
    assert(cells(second) === cells(expected),
      "rewritten corpus must rebuild the memoized bitmap, not serve the stale one")
  }

  test("probe verdicts match the set-form oracle semantics") {
    // independent reimplementation: pass ⟺ all k positions are in the
    // corpus's distinct position set (what the DuckDB oracle computes)
    val corpusIds = (0L until 200L).filter(_ % 3 == 0)
    val batchIds = 0L until 250L
    val p = Dedup.minhashP
    def posOf(id: Long): Seq[Long] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString.take(15)
      val bh = java.lang.Long.parseLong(hex, 16) % p
      (0 until 5).map(i => (Dedup.affineA(i) * bh + Dedup.affineC(i)) % p % 4096L)
    }
    val corpusPos = corpusIds.flatMap(posOf).toSet
    val expected = batchIds.map(id => id -> posOf(id).forall(corpusPos)).toMap
    val bloom = Dedup.bloomBuild(keys(corpusIds), "doc_id", 4096, 5)
    val got = Dedup.bloomProbe(keys(batchIds), "doc_id", bloom, 4096, 5)
      .select("doc_id", "bloom_pass").as[(Long, Boolean)].collect().toMap
    assert(got === expected)
  }
}

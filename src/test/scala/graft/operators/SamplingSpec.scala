package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting properties on the real corpus. */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables(spark, dir, "documents")

  test("train/test split is deterministic and content-keyed (no dup leakage)") {
    val s1 = Sampling.trainTestSplit(docs, "text", 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.trainTestSplit(docs, "text", 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2)

    // exact duplicates land on the same side, always
    val dupSides = Sampling.trainTestSplit(docs, "text", 0.2)
      .groupBy("text").agg(countDistinct(col("split")).as("sides"))
      .agg(max(col("sides"))).head().getLong(0)
    assert(dupSides === 1L, "duplicate texts split across train/test")

    // both sides populated, test fraction in a loose band around 20%
    val n = s1.size.toDouble
    val testFrac = s1.values.count(_ == "test") / n
    assert(testFrac > 0.05 && testFrac < 0.45, s"test fraction $testFrac")
  }

  test("stratified sample keeps ~the per-stratum fractions, drops unlisted") {
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.stratifiedSample(docs, "lang", "doc_id", fractions)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet.subsetOf(fractions.keySet), s"unlisted strata kept: $after")
    assert(after("de") === before("de"), "fraction 1.0 must keep everything")
    val enRate = after("en").toDouble / before("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en keep rate $enRate (want ~0.5)")
  }

  test("split/sample plans are pure scans — no shuffle, no exchange") {
    // per-row hash decisions must not repartition anything at 100 TB
    Seq(
      Sampling.trainTestSplit(docs, "text", 0.2),
      Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 0.5)))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), "sampling plan shuffles:\n" + plan.take(1500))
      }
  }

  test("int8 quantization: dequant error bounded by scale/2") {
    val q = graft.operators.Similarity.quantizeInt8(
      graft.core.Tables(spark, dir, "embeddings"))
    val joined = graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      .join(q, Seq("vec_id"))
      .select(col("vec_id"), col("scale"),
        array_max(zip_with(col("e"), col("qvec"),
          (x, qv) => abs(x - qv.cast("double") * col("scale")))).as("max_err"))
    val bad = joined.filter(col("max_err") > col("scale") * 0.5 + 1e-12).count()
    assert(bad === 0L, s"$bad vectors exceed the dequant error bound")
    assert(q.count() === 500L)
  }

  test("token budget: cumulative sum is monotone and within budget") {
    val shard = Sampling.tokenBudget(
        docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n")),
        "doc_id", "n", budget = 5000L)
      .orderBy("doc_id").collect()
    assert(shard.nonEmpty)
    val cums = shard.map(_.getAs[Long]("cum_tokens"))
    assert(cums.last <= 5000L)
    assert(cums.sameElements(cums.sorted), "cumulative sum must be monotone")
    // the NEXT doc would have blown the budget (shard is maximal)
    val all = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect()
    if (all.length > shard.length)
      assert(cums.last + all(shard.length).getAs[Long]("n") > 5000L)
  }

  test("sourceMixture: per-source allotments honored, maximal, unlisted dropped") {
    val withN = docs.select(col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")).as("n"))
    val weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val allot = Map("src0" -> 1000L, "src1" -> 500L, "src2" -> 500L)
    val mixed = Sampling.sourceMixture(withN, "source", "doc_id", "n",
        totalBudget = 2000L, weights)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("cum_tokens")))
    assert(mixed.nonEmpty)
    assert(mixed.map(_._2).toSet.subsetOf(weights.keySet),
      "unlisted sources must be dropped")
    val bySource = mixed.groupBy(_._2)
    bySource.foreach { case (s, ds) =>
      assert(ds.map(_._3).max <= allot(s),
        s"source $s exceeds its ${allot(s)}-token allotment")
    }
    // maximality: the first EXCLUDED doc per source (in the same salted
    // hash order) would have blown the allotment
    val hashed = withN
      .withColumn("h", Sampling.hash60(
        concat(lit("mix|"), col("doc_id").cast("string"))))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n"), r.getAs[Long]("h")))
    weights.keys.foreach { s =>
      val kept = bySource.get(s).map(_.map(_._1).toSet).getOrElse(Set.empty)
      val ordered = hashed.filter(_._2 == s).sortBy(t => (t._4, t._1))
      val keptTotal = bySource.get(s).map(_.map(_._3).max).getOrElse(0L)
      ordered.find(t => !kept.contains(t._1)).foreach { firstOut =>
        assert(keptTotal + firstOut._3 > allot(s),
          s"source $s stopped early: ${keptTotal} + ${firstOut._3} fits ${allot(s)}")
      }
    }
    // deterministic: same inputs, same selection
    val again = Sampling.sourceMixture(withN, "source", "doc_id", "n",
        totalBudget = 2000L, weights)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === mixed.map(t => (t._1, t._2)).toSet)
  }

  test("packSequences: greedy invariants on the real corpus") {
    val withN = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
    val packed = Sampling.packSequences(withN, "doc_id", "n",
        maxLen = 512L, shardTokens = 5000L)
      .join(withN, Seq("doc_id"))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard_id"),
        r.getAs[Long]("seq_idx"), r.getAs[Long]("n")))
    assert(packed.length === docs.count(), "every doc packed exactly once")
    packed.groupBy(p => (p._2, p._3)).foreach { case ((sh, seq), ds) =>
      // a sequence respects maxLen unless it is one over-long doc alone
      val total = ds.map(_._4).sum
      assert(total <= 512L || ds.length == 1,
        s"sequence ($sh,$seq) holds $total tokens across ${ds.length} docs")
    }
    // within a shard, seq_idx is non-decreasing in doc order and greedy:
    // a new sequence starts only because the previous one was full
    packed.groupBy(_._2).foreach { case (sh, ds) =>
      val inOrder = ds.sortBy(_._1)
      inOrder.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, _, s2, n2)) =>
          assert(s2 == s1 || s2 == s1 + 1, s"shard $sh skips a sequence")
          if (s2 == s1 + 1) {
            val prevTotal = inOrder.filter(_._3 == s1).map(_._4).sum
            assert(prevTotal + n2 > 512L,
              s"shard $sh seq $s1 closed early ($prevTotal + $n2 <= 512)")
          }
        case _ => ()
      }
    }
  }

  test("interleaveBySource: non-power-of-two weight fails fast; pow-2 positions exact") {
    val docs = graft.core.Tables(spark, dir, "documents")
    // 1/3 cannot place positions exactly in binary — must fail loudly
    // instead of silently float-rounding the interleave order
    val e = intercept[IllegalArgumentException] {
      Sampling.interleaveBySource(docs, "lang", "doc_id",
        Map("en" -> (1.0 / 3.0), "de" -> 0.5))
    }
    assert(e.getMessage.contains("power of two"))
    // power-of-two weights: position k/w is an exact multiple of 1/w, so
    // scaling by w recovers the integer rank bit-exactly
    val pos = Sampling.interleaveBySource(docs, "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25))
      .select(org.apache.spark.sql.functions.col("interleave_pos"),
        org.apache.spark.sql.functions.col("lang"))
      .collect()
    assert(pos.nonEmpty)
    pos.foreach { r =>
      val w = if (r.getString(1) == "en") 0.5 else 0.25
      val scaled = r.getDouble(0) * w
      assert(scaled == math.rint(scaled),
        s"position ${r.getDouble(0)} for weight $w is not an exact rank multiple")
    }
  }

  test("temperatureSample: alpha=1 is the natural mix; alpha<1 flattens") {
    // alpha = 1: w_l = n_l / N, so keep_rate = targetFraction for EVERY
    // stratum — the temperature rule degrades to plain uniform sampling
    val natural = Sampling.temperatureSample(docs, "lang", "doc_id", 1.0, 0.4)
      .select("lang", "keep_rate").distinct().collect()
    natural.foreach(r => assert(math.abs(r.getDouble(1) - 0.4) < 1e-12,
      s"alpha=1 keep_rate ${r.getDouble(1)} for ${r.getString(0)}"))

    // alpha < 1: the head stratum's rate drops below target, every tail
    // stratum's rate rises above it (p^alpha flattening), and rates are
    // ordered opposite to stratum size
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val head = before.maxBy(_._2)._1
    val rates = Sampling.temperatureSample(docs, "lang", "doc_id", 0.5, 0.3)
      .select("lang", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates(head) < 0.3, s"head '$head' rate ${rates(head)} not downweighted")
    (before.keySet - head).foreach { l =>
      assert(rates(l) > 0.3, s"tail '$l' rate ${rates(l)} not boosted")
    }
    before.toSeq.sortBy(_._2).map(_._1).sliding(2).foreach {
      case Seq(small, big) =>
        assert(rates(small) >= rates(big),
          s"rate($small)=${rates(small)} < rate($big)=${rates(big)}")
      case _ =>
    }
  }

  test("temperatureSample: deterministic, rate-clipped at 1, near-target size") {
    val s1 = Sampling.temperatureSample(docs, "lang", "doc_id", 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.temperatureSample(docs, "lang", "doc_id", 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "same params must reproduce the same sample")

    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.3) < 0.1,
      s"sample ${s1.size}/$n far from the 30% target")

    // strong flattening + high target: tiny strata clip at keep_rate 1
    // (kept wholesale) while rates never exceed 1
    val clipped = Sampling.temperatureSample(docs, "lang", "doc_id", 0.1, 0.9)
      .select("lang", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(clipped.values.forall(_ <= 1.0), s"rate above 1: $clipped")
    assert(clipped.values.exists(_ == 1.0),
      s"expected at least one clipped stratum at alpha=0.1/target=0.9: $clipped")
  }

  test("dsirWeights: target-vocab docs outscore off-vocab docs") {
    import spark.implicits._
    // target docs speak vocab A; the raw pool holds one pure-A doc, one
    // pure-B doc, and one mixed doc — the published selection property is
    // the ordering A > mixed > B among the scored (non-target) docs
    val rows = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma", true),
      (3L, "alpha beta gamma beta alpha", true),
      (10L, "alpha beta gamma alpha gamma", false),
      (11L, "alpha beta zulu yankee alpha", false),
      (12L, "zulu yankee xray zulu yankee", false)
    ).toDF("doc_id", "text", "is_t")
    val w = Sampling.dsirWeights(rows, "doc_id", "text", col("is_t"), 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size === 6, s"every tokenized doc must be scored: $w")
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite), s"non-finite: $w")
    assert(w(10L) > w(11L) && w(11L) > w(12L),
      s"expected target-vocab ordering 10 > 11 > 12, got $w")

    // deterministic across plans (the md5 bucket hash, not a seed)
    val w2 = Sampling.dsirWeights(rows, "doc_id", "text", col("is_t"), 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w === w2)
  }

  test("dsirWeights: on the corpus, target docs outscore non-target on average") {
    // weights are an empirical log-likelihood ratio fit on these very
    // docs, so the target class mean must exceed the raw-pool mean (the
    // smoothed-KL argument); also pins row count = every doc scored once
    val w = Sampling.dsirWeights(docs, "doc_id", "text",
      col("source") === "src0", 256)
    assert(w.count() === docs.count(), "every doc must be scored exactly once")
    val means = w.groupBy("is_tgt").agg(avg(col("dsir_weight")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean ${means(true)} must exceed raw mean ${means(false)}")
  }
}

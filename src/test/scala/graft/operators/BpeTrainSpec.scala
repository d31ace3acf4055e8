package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextOps.bpeTrain]] — the Sennrich training loop. Pins (1) the exact
  * learned table on a hand-computed corpus, (2) agreement with an
  * independent plain-Scala model of the reference training algorithm on
  * random corpora over a tiny alphabet (repeated-char runs are the
  * adversarial shape for merge-pass semantics — the r14 ADVICE class),
  * and (3) rank-consistency with the INFERENCE kernel: applying the
  * learned table via [[graft.functions.BpeApply]] reproduces each
  * word's trained piece stream on this corpus (sequential training
  * passes and the min-rank apply loop agree whenever later merges never
  * recreate an earlier pair's adjacency — the generic case; a
  * piece-string collision could in principle diverge, which is why the
  * gate's oracle replays the TRAINING loop itself rather than leaning
  * on this equivalence). */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  /** Independent model: word-type vocab with frequencies, repeated
    * (count pairs -> max with (x,y) lexicographic tie-break ->
    * left-to-right merge pass with continue-past-the-merge). */
  private def model(words: Seq[String], steps: Int)
      : (Seq[(Long, String, String, String, Long)], Map[String, Vector[String]]) = {
    var vocab: Map[String, (Long, Vector[String])] =
      words.groupBy(identity).map { case (w, occ) =>
        w -> ((occ.size.toLong, w.map(String.valueOf(_)).toVector))
      }
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var k = 1
    var done = false
    while (k <= steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (f, ps) =>
        (0 until ps.length - 1).foreach { i =>
          counts((ps(i), ps(i + 1))) =
            counts.getOrElse((ps(i), ps(i + 1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((x, y), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        learned += ((k.toLong, x, y, x + y, cnt))
        vocab = vocab.map { case (w, (f, ps)) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ps.length) {
            if (i < ps.length - 1 && ps(i) == x && ps(i + 1) == y) {
              out += x + y; i += 2
            } else { out += ps(i); i += 1 }
          }
          w -> ((f, out.toVector))
        }
        k += 1
      }
    }
    (learned.toSeq, vocab.map { case (w, (_, ps)) => w -> ps })
  }

  private def train(words: Seq[String], steps: Int)
      : Seq[(Long, String, String, String, Long)] =
    TextOps.bpeTrain(words.map(Tuple1(_)).toDF("text"), "text",
        wordRe = "[a-z]{1,12}", steps = steps)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("hand-computed corpus: counts, tie-breaks, and multi-level merges") {
    // vocab: low x3, lower x2, lowest x1 -> pair counts weighted by freq:
    // (l,o) 6, (o,w) 6, (w,e) 3, (e,r) 2, (e,s) 1, (s,t) 1.
    // step 1: tie (l,o)/(o,w) at 6 -> lexicographic picks (l,o).
    // step 2: (lo,w) 6. step 3: (e,r) 2 vs (low,e) 3 -> (low,e) 3.
    // step 4: (e,r) 2 ... with 'lowe' merged: (lowe,r) 2, (e,r) gone,
    // tie (lowe,r)/(r? ...) -> counts: (lowe,r) 2, (lowe,s) 1, (s,t) 1
    // -> picks (lowe,r) at 2.
    val words = Seq.fill(3)("low") ++ Seq.fill(2)("lower") ++ Seq("lowest")
    val got = train(words, 4)
    assert(got === Seq(
      (1L, "l", "o", "lo", 6L),
      (2L, "lo", "w", "low", 6L),
      (3L, "low", "e", "lowe", 3L),
      (4L, "lowe", "r", "lower", 2L)))
  }

  test("repeated-char runs: the merge pass is the reference pass") {
    // 'aaaaa' x2, 'aaaa' x1: (a,a) count = 4*2 + 3 = 11; the pass folds
    // aaaaa -> [aa,aa,a] and aaaa -> [aa,aa]; step 2 then sees (aa,aa)
    // count 2+1=3 vs (aa,a) 2 -> picks (aa,aa).
    val got = train(Seq("aaaaa", "aaaaa", "aaaa"), 2)
    assert(got === Seq(
      (1L, "a", "a", "aa", 11L),
      (2L, "aa", "aa", "aaaa", 3L)))
  }

  test("agrees with the independent model on random corpora") {
    val rnd = new scala.util.Random(1234L)
    val alpha = "ab"
    for (trial <- 0 until 12) {
      val words = Seq.fill(rnd.nextInt(30) + 5)(
        Seq.fill(rnd.nextInt(8) + 1)(alpha(rnd.nextInt(2))).mkString)
      val steps = rnd.nextInt(5) + 1
      val (want, _) = model(words, steps)
      assert(train(words, steps) === want, s"trial $trial: words=$words")
    }
  }

  test("learned table replays through the inference kernel") {
    val words = Seq.fill(4)("banana") ++ Seq.fill(3)("bandana") ++
      Seq("ban", "anna", "naan", "aaaa")
    val steps = 5
    val (learned, finalVocab) = model(words, steps)
    val merges = learned.map { case (_, x, y, _, _) => s"$x $y" }
    // the trained fixpoint == the min-rank apply fixpoint, word by word
    val applied = words.distinct.map(Tuple1(_)).toDF("w")
      .select(col("w"), graft.functions.GraftFunctions.bpeApply(
        array(col("w")), merges).as("r"))
      .select(col("w"), col("r.n_pieces").as("n"), col("r.enc").as("enc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    words.distinct.foreach { w =>
      val want = finalVocab(w)
      assert(applied(w) === ((want.length.toLong,
        want.mkString("|", "|", "|"))), s"word $w")
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BpeApply]] — the true-BPE merge-loop kernel. Pins the reference
  * semantics (Sennrich/GPT-2): lowest-rank adjacent pair, merge ALL its
  * occurrences in one left-to-right pass (continue past each merged
  * pair), re-pick to fixpoint; multi-level merges compose; OOV
  * characters survive as single pieces. Also pins, property-style, the
  * fixpoint equivalence with the ORACLE's serialization (iterated
  * leftmost-single-occurrence merge with a sticky pair pick) that the
  * txt_bpe_apply gate's unrolled SQL relies on. */
class BpeApplySpec extends SparkSpec {

  import spark.implicits._

  private def run(tokens: Seq[String], merges: Seq[String]): (Long, String) = {
    val r = Seq(Tuple1(tokens)).toDF("ws")
      .select(GraftFunctions.bpeApply(col("ws"), merges).as("r"))
      .select(col("r.n_pieces"), col("r.enc")).collect()(0)
    (r.getLong(0), r.getString(1))
  }

  /** Independent model of the ORACLE's step semantics: merge the SINGLE
    * leftmost occurrence of the sticky pick (previous pair while still
    * present, else min rank present), iterate to fixpoint. The kernel
    * implements the reference pass instead; the two must agree on every
    * fixpoint — this is the equivalence the gate's SQL unrolling rests
    * on. */
  private def oracleModel(word: String, merges: Seq[String]): Seq[String] = {
    val pairs = merges.map { m =>
      val sp = m.indexOf(' '); (m.substring(0, sp), m.substring(sp + 1))
    }
    var ps = word.map(String.valueOf(_)).toVector
    var prev = -1
    var halt = ps.length < 2
    while (!halt) {
      val present = pairs.zipWithIndex.filter { case ((x, y), _) =>
        (0 until ps.length - 1).exists(i => ps(i) == x && ps(i + 1) == y)
      }
      if (present.isEmpty) halt = true
      else {
        val ((x, y), r) =
          present.find(_._2 == prev).getOrElse(present.minBy(_._2))
        val i = (0 until ps.length - 1)
          .find(i => ps(i) == x && ps(i + 1) == y).get
        ps = ps.patch(i, Seq(x + y), 2)
        prev = r
        if (ps.length < 2) halt = true
      }
    }
    ps
  }

  test("multi-level merges compose in rank order") {
    val merges = graft.operators.TextOps.demoBpeMerges
    // t h → th, th e → the
    assert(run(Seq("the"), merges) === ((1L, "|the|")))
    // rank order is load-bearing: with the demo table, (e,r) at rank 3
    // beats (th,e) at rank 18 after the first merge, so 'there' stops at
    // th/er/e — NOT the naive left-to-right reading
    assert(run(Seq("there"), merges) === ((3L, "|th|er|e|")))
    // a table ranked for full composition walks all four levels down
    assert(run(Seq("there"), Seq("t h", "th e", "r e", "the re"))
      === ((1L, "|there|")))
    // no applicable merge: single characters survive
    assert(run(Seq("xyz"), merges) === ((3L, "|x|y|z|")))
    // several words: space-joined stream, counts sum
    assert(run(Seq("the", "xyz"), merges) === ((4L, "|the| |x|y|z|")))
  }

  test("repeated-pair runs merge left-to-right like the reference pass") {
    // one merge (a,a): the pass pairs up a run strictly left-to-right —
    // floor(n/2) 'aa' pieces, trailing 'a' iff odd. String-replace
    // semantics would give |aa|a|aa| for aaaaa (the consumed boundary
    // pipe skips the middle occurrence) — the exact divergence this
    // kernel must NOT have.
    assert(run(Seq("aaaa"), Seq("a a")) === ((2L, "|aa|aa|")))
    assert(run(Seq("aaa"), Seq("a a")) === ((2L, "|aa|a|")))
    assert(run(Seq("aaaaa"), Seq("a a")) === ((3L, "|aa|aa|a|")))
    assert(run(Seq("aaaaaa"), Seq("a a")) === ((3L, "|aa|aa|aa|")))
    // the demo table has (o,o): a real-word-shaped run
    assert(run(Seq("sooooo"), graft.operators.TextOps.demoBpeMerges)
      === ((4L, "|s|oo|oo|o|")))
    // rank order decides between competing pairs: (b,c) outranks (a,b)
    assert(run(Seq("abc"), Seq("b c", "a b")) === ((2L, "|a|bc|")))
    assert(run(Seq("abc"), Seq("a b", "b c")) === ((2L, "|ab|c|")))
  }

  test("the chosen pair's pass completes before re-picking ranks") {
    // merges rank0 (aa,a), rank1 (a,a), word aaaa: the reference first
    // exhausts (a,a) — the only pair present — in ONE full pass
    // ([aa][aa]), so rank0 never fires. A naive min-rank re-pick after
    // every single merge would instead see (aa,a) after the first merge
    // and produce [aaa][a]. Pins both the kernel's pass semantics and
    // the oracle's sticky pick rule.
    assert(run(Seq("aaaa"), Seq("aa a", "a a")) === ((2L, "|aa|aa|")))
    // but once the pass is done and re-pick happens, a pair CREATED by
    // the pass is eligible: baaa → pass (a,a) → [b][aa][a], re-pick
    // finds rank0 (b,aa) → [baa][a]
    assert(run(Seq("baaa"), Seq("b aa", "a a")) === ((2L, "|baa|a|")))
  }

  test("kernel pass fixpoint equals the oracle's sticky leftmost-single serialization") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab"
    val candidatePieces =
      Seq("a", "b", "aa", "ab", "ba", "bb", "aab", "aba")
    for (trial <- 0 until 300) {
      val word = Seq.fill(1 + rnd.nextInt(10))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val nMerges = 1 + rnd.nextInt(6)
      val merges = rnd.shuffle(
        (for (x <- candidatePieces; y <- candidatePieces) yield s"$x $y")
          .toVector).take(nMerges)
      val expected = oracleModel(word, merges)
      val (n, enc) = run(Seq(word), merges)
      val want = "|" + expected.map(_ + "|").mkString
      assert((n, enc) === ((expected.length.toLong, want)),
        s"trial $trial word=$word merges=$merges")
    }
  }

  test("null slots skipped; empty array yields zero pieces") {
    val merges = Seq("a a")
    assert(run(Seq.empty[String], merges) === ((0L, "")))
    val r = Seq(Tuple1(Seq[String]("aa", null, "aa"))).toDF("ws")
      .select(GraftFunctions.bpeApply(col("ws"), merges).as("r"))
      .select(col("r.n_pieces"), col("r.enc")).collect()(0)
    assert((r.getLong(0), r.getString(1)) === ((2L, "|aa| |aa|")))
  }

  test("rejects malformed merge entries and non-array input") {
    val df = Seq("word").toDF("s")
    val e = intercept[Exception] {
      df.select(GraftFunctions.bpeApply(col("s"), Seq("a a"))).collect()
    }
    assert(e.getMessage.contains("graft_bpe_apply"))
    val e2 = intercept[Exception] {
      Seq(Tuple1(Seq("ab"))).toDF("ws")
        .select(GraftFunctions.bpeApply(col("ws"), Seq("nospace"))).collect()
    }
    assert(e2.getMessage.contains("x y"))
  }

  test("boundary-encoding preconditions fail loudly, never silently corrupt") {
    // a '|' in a token would be indistinguishable from a piece boundary
    // (wrong n_pieces, ambiguous enc); whitespace would collide with the
    // word-join separator — both are named errors, not wrong output
    val e = intercept[Exception] { run(Seq("a|b"), Seq("a b")) }
    assert(e.getMessage.contains("boundary-encoding"))
    val e2 = intercept[Exception] { run(Seq("a b"), Seq("a b")) }
    assert(e2.getMessage.contains("boundary-encoding"))
    // merge pieces under the same rule
    val e3 = intercept[Exception] { run(Seq("ab"), Seq("a| b")) }
    assert(e3.getMessage.contains("must not contain '|'"))
    // a NULL merge entry gets the named error, not a bare NPE
    val e4 = intercept[Exception] { run(Seq("ab"), Seq("a b", null)) }
    assert(e4.getMessage.contains("must not be NULL"))
  }
}

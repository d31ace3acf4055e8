package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BpeApply]] — the true-BPE merge-loop kernel. Pins the reference
  * semantics the oracle replays: lowest-rank applicable merge first,
  * left-to-right non-overlapping replacement per step, iterate to
  * fixpoint; multi-level merges compose; OOV characters survive as
  * single pieces. */
class BpeApplySpec extends SparkSpec {

  import spark.implicits._

  private def run(tokens: Seq[String], merges: Seq[String]): (Long, String) = {
    val r = Seq(Tuple1(tokens)).toDF("ws")
      .select(GraftFunctions.bpeApply(col("ws"), merges).as("r"))
      .select(col("r.n_pieces"), col("r.enc")).collect()(0)
    (r.getLong(0), r.getString(1))
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

  test("left-to-right non-overlap per step, re-picked to fixpoint") {
    // one merge (a,a): 'aaaa' → step 1 merges positions 0-1 (the
    // boundary-sharing pair 2-3 is skipped by the consumed pipe), step 2
    // merges the remainder — fixpoint [aa][aa], the reference result
    assert(run(Seq("aaaa"), Seq("a a")) === ((2L, "|aa|aa|")))
    // odd count: trailing single char survives
    assert(run(Seq("aaa"), Seq("a a")) === ((2L, "|aa|a|")))
    // rank order decides between competing pairs: (b,c) outranks (a,b)
    assert(run(Seq("abc"), Seq("b c", "a b")) === ((2L, "|a|bc|")))
    assert(run(Seq("abc"), Seq("a b", "b c")) === ((2L, "|ab|c|")))
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

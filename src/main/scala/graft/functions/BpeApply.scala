package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: TRUE byte-pair-encoding merge application
  * over ONE document's token array against a fixed ranked merge table —
  * the next tokenizer-realism step past [[SubwordTokenize]]'s greedy
  * MaxMatch. `array<string> tokens in, struct<n_pieces bigint,
  * enc string> out`, where `enc` is each word's final piece sequence in
  * the boundary encoding `|p1|p2|...|` (words joined by one space, in
  * array order) and `n_pieces` is the total piece count.
  *
  * Algorithm (Sennrich et al. 2016 inference; the GPT-2 reference loop):
  * start from single characters, repeatedly pick the LOWEST-RANK merge
  * whose pair `(x,y)` is adjacent somewhere in the piece sequence, merge
  * ALL its occurrences in one left-to-right pass (after merging at
  * `(i,i+1)` the scan continues at `i+2`, so a run like `aaaaa` under
  * merge `(a,a)` becomes `aa aa a`, never `aa a aa`), then re-pick —
  * until no merge applies. This is the literal piece-array pass from the
  * reference implementations, NOT string `replace` (whose
  * scan-past-the-consumed-boundary semantics diverges on repeated-pair
  * runs: `replace` on the boundary encoding of `aaaaa` yields
  * `|aa|a|aa|`).
  *
  * The whole loop is still EXACTLY replayable in SQL (gate
  * txt_bpe_apply) through an equivalent serialization: iterate "merge
  * the SINGLE LEFTMOST occurrence of the current pair" with a STICKY
  * pick rule (keep the previous step's pair while it is still present,
  * else the min-rank pair present). Equivalence: (1) merging an
  * occurrence of `(x,y)` can never create a new occurrence of the same
  * pair (`xy` differs from both `x` and `y` — pieces are non-empty) nor
  * one left of the merge point (new adjacencies involve only the merged
  * piece), so iterated leftmost-single-merge visits exactly the pass's
  * occurrences in the same order with identical overlap resolution;
  * (2) sticky pick = finish the current pair's pass before re-picking,
  * exactly the reference outer loop. Each oracle step is one
  * first-match `regexp_replace(s, '\|x\|y\|', '|xy|')` (DuckDB replaces
  * only the leftmost match without the 'g' flag), and ≤ maxlen−1 steps
  * reach the fixpoint because every productive step removes exactly one
  * piece.
  *
  * Null token slots are skipped. Matching is by Java/UTF-16 code units —
  * parity with character-based SQL engines holds on BMP text; the gate
  * additionally scopes words to `[a-z]+` so the char-split itself is
  * engine-portable.
  *
  * Scale shape: pure per-row column algebra, zero shuffle, one virtual
  * call per document; the merge table is a query-constant literal (a
  * production deployment materializes trained merges into the literal
  * the same way the subword vocab and IVF centroids are served). */
case class BpeApply(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SubwordTokenize.checkWordVocab(prettyName, left, right,
      { case ArrayType(StringType, _) => true; case _ => false },
      "an array<string> of tokens")

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("enc", StringType, nullable = false)))

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "graft_bpe_apply"

  // "x y" entries in rank order → (x, y, xy) piece triples plus a
  // first-rank-wins adjacency→rank lookup, two-level (left piece → right
  // piece → rank) so the hot loop probes with the piece strings
  // themselves — zero per-probe key allocation for a lookup that runs
  // O(pieces) per pass per word over the whole corpus. Materialized once
  // per expression instance.
  @transient private lazy val (lefts, rights, joined, rankOf)
      : (Array[String], Array[String], Array[String],
         java.util.HashMap[String, java.util.HashMap[String, Integer]]) = {
    val m = right.eval().asInstanceOf[ArrayData]
    val n = m.numElements()
    val xs = new Array[String](n)
    val ys = new Array[String](n)
    val xy = new Array[String](n)
    val rk =
      new java.util.HashMap[String, java.util.HashMap[String, Integer]](n * 2)
    var i = 0
    while (i < n) {
      val e = m.getUTF8String(i)
      require(e != null, s"$prettyName merge entries must not be NULL")
      val entry = e.toString
      val sp = entry.indexOf(' ')
      require(sp > 0 && sp < entry.length - 1,
        s"$prettyName merge entries must be 'x y' pairs, got '$entry'")
      require(!entry.contains('|'),
        s"$prettyName merge pieces must not contain '|' " +
          s"(the boundary-encoding character), got '$entry'")
      val x = entry.substring(0, sp)
      val y = entry.substring(sp + 1)
      require(!x.exists(Character.isWhitespace) &&
          !y.exists(Character.isWhitespace),
        s"$prettyName merge pieces must not contain whitespace, got '$entry'")
      xs(i) = x
      ys(i) = y
      xy(i) = x + y
      rk.computeIfAbsent(x, _ => new java.util.HashMap[String, Integer](4))
        .putIfAbsent(y, Integer.valueOf(i))
      i += 1
    }
    (xs, ys, xy, rk)
  }

  /** One document's merged piece stream — public for generated code. */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val enc = new java.lang.StringBuilder(64)
    var pieces = 0L
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val str = w.toString
        // single-char start state. The '|' and whitespace guards are the
        // output encoding's soundness precondition: a user pipe would be
        // indistinguishable from a piece boundary (wrong n_pieces,
        // ambiguous enc) and a space would collide with the word-join
        // separator — fail LOUDLY with the function's name (the
        // pplBuckets raise_error precedent) instead of returning
        // silently-wrong output. Whitespace tokenizers never produce
        // either; a direct SQL caller with raw data pre-filters.
        val ps = new Array[String](str.length)
        var c = 0
        while (c < str.length) {
          val ch = str.charAt(c)
          if (ch == '|' || Character.isWhitespace(ch))
            throw new IllegalArgumentException(
              s"$prettyName tokens must not contain '|' or whitespace " +
                s"(boundary-encoding characters), got '$str'")
          ps(c) = String.valueOf(ch)
          c += 1
        }
        var len = str.length
        // reference loop: lowest-rank pair adjacent anywhere, merge ALL
        // its occurrences in one left-to-right pass (continue past both
        // merged pieces), re-pick, until no merge applies
        var done = len < 2
        while (!done) {
          var best = Int.MaxValue
          var j = 0
          while (j < len - 1) {
            val byRight = rankOf.get(ps(j))
            if (byRight != null) {
              val r = byRight.get(ps(j + 1))
              if (r != null && r.intValue() < best) best = r.intValue()
            }
            j += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val x = lefts(best); val y = rights(best); val m = joined(best)
            var wr = 0
            var rd = 0
            while (rd < len) {
              if (rd < len - 1 && ps(rd) == x && ps(rd + 1) == y) {
                ps(wr) = m; rd += 2
              } else {
                ps(wr) = ps(rd); rd += 1
              }
              wr += 1
            }
            len = wr
            if (len < 2) done = true
          }
        }
        if (enc.length > 0) enc.append(' ')
        enc.append('|')
        var j = 0
        while (j < len) { enc.append(ps(j)); enc.append('|'); j += 1 }
        pieces += len
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](pieces, UTF8String.fromString(enc.toString)))
  }

  override protected def nullSafeEval(tokens: Any, merges: Any): Any =
    compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeApply =
    copy(left = newLeft, right = newRight)
}

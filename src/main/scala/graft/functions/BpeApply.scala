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
  * start from single characters, repeatedly find the LOWEST-RANK merge
  * whose pair is adjacent somewhere in the word and replace its
  * occurrences, until no merge applies. The per-step replacement is
  * left-to-right non-overlapping on the boundary encoding
  * (`s.replace("|x|y|", "|xy|")`) — an occurrence sharing its boundary
  * pipe with a just-replaced one is picked up by the NEXT iteration,
  * which re-selects the same still-lowest rank, so the fixpoint equals
  * the reference algorithm's. This step is EXACTLY replayable in SQL
  * (`replace(s, pat, rep)` has the same left-to-right non-overlap
  * semantics in DuckDB), which is what puts the whole merge loop under a
  * hash-checked oracle (gate txt_bpe_apply): each unrolled oracle step
  * applies the min-rank `contains` hit via one `replace`, and ≤ maxlen−1
  * steps reach the fixpoint because every productive step removes at
  * least one piece.
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

  // "x y" entries in rank order → boundary-encoded search/replace pairs,
  // materialized once per expression instance
  @transient private lazy val (pats, reps): (Array[String], Array[String]) = {
    val m = right.eval().asInstanceOf[ArrayData]
    val n = m.numElements()
    val p = new Array[String](n)
    val r = new Array[String](n)
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
      p(i) = s"|$x|$y|"
      r(i) = s"|$x$y|"
      i += 1
    }
    (p, r)
  }

  /** One document's merged piece stream — public for generated code. */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val np = pats.length
    val enc = new java.lang.StringBuilder(64)
    var pieces = 0L
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (w != null) {
        val str = w.toString
        // boundary encoding of the single-char start state. The '|' and
        // whitespace guards are the encoding's soundness precondition: a
        // user pipe would be indistinguishable from a piece boundary
        // (wrong n_pieces, ambiguous enc) and a space would collide with
        // the word-join separator — fail LOUDLY with the function's name
        // (the pplBuckets raise_error precedent) instead of returning
        // silently-wrong output. Whitespace tokenizers never produce
        // either; a direct SQL caller with raw data pre-filters.
        val b = new java.lang.StringBuilder(str.length * 2 + 1)
        b.append('|')
        var c = 0
        while (c < str.length) {
          val ch = str.charAt(c)
          if (ch == '|' || Character.isWhitespace(ch))
            throw new IllegalArgumentException(
              s"$prettyName tokens must not contain '|' or whitespace " +
                s"(boundary-encoding characters), got '$str'")
          b.append(ch); b.append('|'); c += 1
        }
        var s = b.toString
        // reference loop: lowest-rank applicable merge, replace, repeat
        var merged = true
        while (merged) {
          merged = false
          var k = 0
          while (k < np && !merged) {
            if (s.contains(pats(k))) { s = s.replace(pats(k), reps(k)); merged = true }
            k += 1
          }
        }
        if (enc.length > 0) enc.append(' ')
        enc.append(s)
        // pieces = boundary pipes − 1 (empty word contributes "|" → 0)
        var pipes = 0
        var j = 0
        while (j < s.length) { if (s.charAt(j) == '|') pipes += 1; j += 1 }
        pieces += math.max(pipes - 1, 0)
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

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: deterministic greedy longest-match
  * subword tokenization of ONE whitespace word against a FIXED literal
  * vocabulary — the MaxMatch scheme WordPiece inference uses (Devlin et
  * al. 2019, minus the `##` continuation marking), with a single-
  * character fallback for out-of-vocabulary spans (the byte/char
  * fallback of SentencePiece-style tokenizers). `word string in,
  * array<string> pieces out`; every piece is either a vocab entry or
  * one character, and the concatenation of the pieces is exactly the
  * input word.
  *
  * Why native: greedy longest-match is a data-dependent loop — not
  * expressible in fixed-depth column algebra (`transform` cannot carry
  * the advancing cursor) — and a Scala UDF would pay per-row
  * serialization. Same playbook as [[WinnowFingerprints]]: hand-written
  * JVM loop, one virtual call per WORD from generated code, so the
  * surrounding projection stays inside whole-stage codegen.
  *
  * Oracle-replayable by construction: the greedy rule is "longest vocab
  * piece that prefixes the remaining suffix, else one character", which
  * a SQL engine replays with a recursive CTE whose step picks the same
  * piece via a literal length-descending COALESCE chain (gate
  * txt_subword_fertility). Matching is by Java/UTF-16 code units;
  * parity with character-based SQL engines holds on BMP text (astral
  * chars would need codepoint stepping — not present in any corpus this
  * engine ingests).
  *
  * Scale shape: pure per-row column algebra — zero shuffle; the vocab
  * is a query-constant literal (a production deployment materializes a
  * trained vocab file into the literal the same way the IVF centroids
  * and LSH planes are served). */
case class SubwordTokenize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string word, got ${left.dataType.simpleString}")
    else if (!right.foldable || (right.dataType match {
        case ArrayType(StringType, _) => false
        case _ => true
      }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<string> vocabulary, " +
          s"got ${right.dataType.simpleString}")
    else if (right.eval() == null) // a typed NULL literal is foldable
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName vocabulary must not evaluate to NULL")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "graft_subword_tokenize"

  /** Vocab set + max piece length, materialized once from the foldable
    * child (SignBuckets' literal-matrix pattern). */
  @transient private lazy val (vocabSet, maxPiece): (java.util.HashSet[String], Int) = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val set = new java.util.HashSet[String](arr.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < arr.numElements()) {
      val p = arr.getUTF8String(i)
      if (p != null && p.numChars() > 0) {
        val s = p.toString
        set.add(s)
        if (s.length > maxLen) maxLen = s.length
      }
      i += 1
    }
    (set, maxLen)
  }

  /** One word's greedy segmentation — public so generated code can call
    * it. O(len · maxPieceLen) substring probes against the hash set. */
  def compute(word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return SubwordTokenize.EmptyResult
    val out = new java.util.ArrayList[Any](n / 2 + 1)
    var pos = 0
    while (pos < n) {
      var len = math.min(maxPiece, n - pos)
      var hit = -1
      while (len >= 1 && hit < 0) {
        if (vocabSet.contains(s.substring(pos, pos + len))) hit = len
        else len -= 1
      }
      val take = if (hit > 0) hit else 1 // OOV: single-char fallback
      out.add(UTF8String.fromString(s.substring(pos, pos + take)))
      pos += take
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(word: Any, vocab: Any): Any =
    compute(word.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subword", this,
      classOf[SubwordTokenize].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $ref.compute($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordTokenize =
    copy(left = newLeft, right = newRight)
}

object SubwordTokenize {
  private val EmptyResult: ArrayData = new GenericArrayData(Array.empty[Any])
}

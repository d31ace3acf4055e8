package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row
import org.scalacheck.Gen

/** The native greedy longest-match subword kernel: greedy semantics, the
  * concatenation invariant, OOV fallback, null/empty handling, and a
  * driver-side reference-model property sweep (same discipline as the
  * other kernel specs — the JVM reference IS the rule the SQL oracle
  * replays, so kernel == reference certifies both directions). */
class SubwordTokenizeSpec extends SparkSpec {

  private val vocab = TextOps.demoSubwordVocab

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("w", StringType, nullable = true)))

  private def pieces(words: Seq[String]): Map[String, Seq[String]] = {
    GraftFunctions.register(spark)
    mkDf(schema, words.zipWithIndex.map { case (w, i) => Row(i.toLong, w) })
      .select(col("w"),
        GraftFunctions.subwordTokenize(col("w"), vocab).as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
  }

  /** Driver-side reference: the exact greedy rule the oracle replays. */
  private def reference(w: String): Seq[String] = {
    val maxLen = vocab.map(_.length).max
    val set = vocab.toSet
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val hit = (math.min(maxLen, w.length - pos) to 1 by -1)
        .map(l => w.substring(pos, pos + l)).find(set.contains)
      val take = hit.getOrElse(w.substring(pos, pos + 1))
      out += take
      pos += take.length
    }
    out.result()
  }

  test("greedy longest match wins over shorter prefixes") {
    // "the" is in vocab along with "te"/"he": longest-first must take
    // "the" whole, not "t"+"he"
    val p = pieces(Seq("the", "theory", "data", "dataset"))
    assert(p("the") === Seq("the"))
    assert(p("theory") === Seq("the", "or", "y"))
    assert(p("data") === Seq("data"))
    assert(p("dataset") === Seq("data", "se", "t"))
  }

  test("OOV spans fall back to single characters") {
    val p = pieces(Seq("zzq", "x9!"))
    assert(p("zzq") === Seq("z", "z", "q"))
    assert(p("x9!") === Seq("x", "9", "!"))
  }

  test("concatenation invariant + reference-model sweep on random words") {
    val alpha = Gen.alphaLowerChar
    val wordGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, alpha))
      .map(_.mkString)
    val words = (1 to 300).flatMap(i => wordGen(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)).toSeq).distinct
    val p = pieces(words.filter(_.nonEmpty))
    p.foreach { case (w, ps) =>
      assert(ps.mkString("") === w, s"pieces of '$w' do not concatenate back")
      assert(ps === reference(w), s"kernel diverges from reference on '$w'")
      assert(ps.forall(x => x.length == 1 || vocab.contains(x)),
        s"non-vocab multi-char piece in '$w'")
    }
  }

  test("empty word yields no pieces; null word yields null") {
    GraftFunctions.register(spark)
    val rows = mkDf(schema, Seq(Row(0L, ""), Row(1L, null)))
      .select(GraftFunctions.subwordTokenize(col("w"), vocab).as("p"))
      .collect()
    assert(rows(0).getSeq[String](0) === Seq.empty)
    assert(rows(1).isNullAt(0))
  }

  test("SubwordCount equals the summed piece counts of the emitting kernel") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val alpha = Gen.alphaLowerChar
    val wordGen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, alpha))
      .map(_.mkString)
    val docs = (1 to 60).map { i =>
      (i.toLong, (1 to (i % 7 + 1)).flatMap(j =>
        wordGen(Gen.Parameters.default,
          org.scalacheck.rng.Seed(i.toLong * 100 + j)).toSeq))
    }
    val df = docs.toDF("doc_id", "toks")
    val rows = df.select(col("doc_id"),
        GraftFunctions.subwordCount(col("toks"), vocab).as("fused"),
        aggregate(transform(col("toks"), w =>
          size(GraftFunctions.subwordTokenize(w, vocab))),
          lit(0), (acc, x) => acc + x).cast("long").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"fused count diverges for doc ${r.getLong(0)}"))
    // null tokens contribute 0; empty array counts 0; null array → null
    val edge = Seq((0L, Seq[String]("the", null, "")),
      (1L, Seq.empty[String]), (2L, null: Seq[String])).toDF("doc_id", "toks")
      .select(GraftFunctions.subwordCount(col("toks"), vocab)).collect()
    assert(edge(0).getLong(0) === 1L)
    assert(edge(1).getLong(0) === 0L)
    assert(edge(2).isNullAt(0))
  }

  test("non-ASCII vocab pieces take the trie's wide-char spillover path") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // ü (U+00FC) and 語 (U+8A9E) sit above the trie's dense 128-slot
    // ASCII fan-out; mixed pieces exercise the boundary in both orders
    val v = Seq("über", "語", "üb", "the")
    val rows = Seq("über", "語語x", "cüber", "theü")
      .toDF("w")
      .select(col("w"), GraftFunctions.subwordTokenize(col("w"), v).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(rows("über") === Seq("über"), "longest wide-char piece must win over üb")
    assert(rows("語語x") === Seq("語", "語", "x"))
    assert(rows("cüber") === Seq("c", "über"))
    assert(rows("theü") === Seq("the", "ü"))
    // the count kernel walks the same trie
    val n = Seq(Seq("über", "語語x", "cüber")).toDF("toks")
      .select(GraftFunctions.subwordCount(col("toks"), v)).collect()(0).getLong(0)
    assert(n === 1 + 3 + 2)
  }

  test("SQL registration: callable and arity/type checked") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("the").toDF("w").createOrReplaceTempView("subword_probe")
    val viaSql = spark.sql(
      "SELECT graft_subword_tokenize(w, array('the', 'he')) AS p " +
        "FROM subword_probe").collect()(0).getSeq[String](0)
    assert(viaSql === Seq("the"))
    val err = intercept[Exception](spark.sql(
      "SELECT graft_subword_tokenize('x') FROM subword_probe").collect())
    assert(err.getMessage.contains("graft_subword_tokenize"))
    // the count kernel is SQL-reachable too, with the same vocab checks
    val viaCnt = spark.sql(
      "SELECT graft_subword_count(array('the', 'zzq'), array('the', 'he')) " +
        "FROM subword_probe").collect()(0).getLong(0)
    assert(viaCnt === 1L + 3L)
    val errCnt = intercept[Exception](spark.sql(
      "SELECT graft_subword_count(array('x')) FROM subword_probe").collect())
    assert(errCnt.getMessage.contains("graft_subword_count"))
  }
}

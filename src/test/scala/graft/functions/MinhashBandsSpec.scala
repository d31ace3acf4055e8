package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MinhashBands]] — the fused portable-MinHash band kernel. The
  * load-bearing test is BYTE PARITY with the composed SQL family the
  * kernel replaced (per-token `conv(substring(md5(w), 1, 15), 16, 10)`
  * base, `Dedup.affineA/affineC` lanes folded by min aggregates,
  * `md5(concat_ws(',', slice))` band hashes): the affine constants are
  * re-implemented inside the kernel for the fused loop, and the DuckDB
  * oracles replay the SAME composed family — so this parity pin is what
  * keeps kernel and oracle from drifting. */
class MinhashBandsSpec extends SparkSpec {

  private val (numHashes, bands) = (64, 16)

  /** The former composed-SQL sketch of the same documents — the family
    * definition the oracles replay. */
  private def composedBands(docs: org.apache.spark.sql.DataFrame) = {
    val p = graft.operators.Dedup.minhashP
    val sets = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("w"))
    val sigAggs = (0 until numHashes).map(i =>
      min((lit(graft.operators.Dedup.affineA(i)) * col("bh")
        + lit(graft.operators.Dedup.affineC(i))) % p).as(s"sig_$i"))
    val sigs = sets
      .withColumn("bh",
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % p)
      .groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws(",",
        (0 until rows).map(r => col(s"sig_${b * rows + r}")): _*))
    }
    sigs.select(col("doc_id"), array(bandCols: _*).as("bhs"))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("band hashes are byte-identical to the composed SQL family") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), col("text"))
    val kernel = docs.select(col("doc_id"),
      GraftFunctions.minhashBands(
        sort_array(array_distinct(split(trim(col("text")), "\\s+"))),
        numHashes, bands).as("bhs"))
    val k = asMap(kernel)
    val c = asMap(composedBands(docs))
    assert(k.keySet === c.keySet)
    // every doc, every band — a single differing byte fails
    k.foreach { case (id, bhs) =>
      assert(bhs === c(id), s"band hashes diverge for doc $id")
    }
    assert(k.values.forall(_.length == bands))
  }

  test("signature is order- and duplicate-insensitive (set semantics)") {
    import spark.implicits._
    val f = GraftFunctions.minhashBands(col("toks"), numHashes, bands)
    val a = Seq(Seq("x", "y", "z")).toDF("toks").select(f).collect()(0).getSeq[String](0)
    val b = Seq(Seq("z", "x", "y", "x")).toDF("toks").select(f).collect()(0).getSeq[String](0)
    assert(a === b)
  }

  test("null tokens are skipped; empty/all-null arrays emit no bands") {
    import spark.implicits._
    val f = GraftFunctions.minhashBands(col("toks"), numHashes, bands)
    val withNull = Seq(Seq[String]("a", null, "b")).toDF("toks")
      .select(f).collect()(0).getSeq[String](0)
    val without = Seq(Seq("a", "b")).toDF("toks")
      .select(f).collect()(0).getSeq[String](0)
    assert(withNull === without)
    assert(Seq(Seq.empty[String]).toDF("toks")
      .select(f).collect()(0).getSeq[String](0).isEmpty)
    assert(Seq(Seq[String](null)).toDF("toks")
      .select(f).collect()(0).getSeq[String](0).isEmpty)
    // null ARRAY propagates null (nullSafeEval contract)
    assert(Seq((1, null: Seq[String])).toDF("i", "toks")
      .select(f).collect()(0).isNullAt(0))
  }

  test("rejects non-array input and non-literal parameters with named errors") {
    import spark.implicits._
    val df = Seq("word").toDF("s")
    val e = intercept[Exception] {
      df.select(GraftFunctions.minhashBands(col("s"), 64, 16)).collect()
    }
    assert(e.getMessage.contains("graft_minhash_bands"))
    val e2 = intercept[IllegalArgumentException] {
      df.selectExpr("graft_minhash_bands(array('a'), length(s), 16)").collect()
    }
    assert(e2.getMessage.contains("numHashes"))
    intercept[IllegalArgumentException] {
      MinhashBands(org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
        64, 7) // 7 does not divide 64
    }
  }
}

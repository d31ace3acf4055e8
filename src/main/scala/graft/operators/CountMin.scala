package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode/Muthukrishnan 2005) over the
  * token stream — the frequency member of the engine's sketch family
  * (membership: Bloom; similarity: MinHash/SimHash; cardinality: HLL).
  *
  * Why at 100 TB: exact token counting shuffles every distinct token
  * (billions of group keys); the sketch aggregates into a FIXED
  * depth×width cell grid — the groupBy key space is bounded by
  * construction, partial aggregation combines map-side (each task emits
  * ≤ d·w partial rows regardless of input size), and the finished
  * sketch broadcasts anywhere. Estimates only overcount (est ≥ true;
  * est ≤ true + εN w.h.p. with ε = e/width) — the right trade for
  * heavy-hitter detection and vocab pruning, where misses matter and
  * overcounts get filtered by the exact pass downstream.
  *
  * Portable: base hash = md5-60(token) mod p, the d rows are the SAME
  * Carter–Wegman affine family as portable MinHash
  * ([[Dedup.affineA]]/[[Dedup.affineC]], p = 2^31 − 1), bucket =
  * h_i mod width — every cell and every estimate is replayable in SQL
  * (gate txt_cms_counts inlines the affine constants as literals).
  * No overflow: a_i, h < 2^31 so a_i·h < 2^62.
  */
object CountMin {

  /** Cell column for hash row `i` over a base-hash column. */
  private def bucket(base: Column, i: Int, width: Int): Column =
    ((lit(Dedup.affineA(i)) * base + lit(Dedup.affineC(i)))
      % Dedup.minhashP) % width

  private def baseHash(c: Column): Column =
    Sampling.hash60(c) % Dedup.minhashP

  /** Build the depth×width sketch from one token explode: (row, bucket,
    * cnt), at most depth·width rows. ONE pass over the corpus (the d
    * cells per token come from a posexplode, not d scans) and one
    * shuffle keyed on the BOUNDED cell id — never on the token. */
  def buildTokens(df: DataFrame, textCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ($depth×$width)")
    df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(baseHash(col("tok")).as("h"))
      .select(posexplode(array(
        (0 until depth).map(i => bucket(col("h"), i, width)): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a small literal term list: min over the d rows
    * of the term's cell, 0 for never-touched cells. The sketch is
    * ≤ d·w rows — broadcast side of the probe join. */
  def estimateTerms(sketch: DataFrame, terms: Seq[String],
      depth: Int, width: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    sketch.sparkSession.range(1)
      .select(explode(array(terms.map(lit): _*)).as("term"))
      .select(col("term"), baseHash(col("term")).as("h"))
      .select(col("term"), posexplode(array(
        (0 until depth).map(i => bucket(col("h"), i, width)): _*))
        .as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}

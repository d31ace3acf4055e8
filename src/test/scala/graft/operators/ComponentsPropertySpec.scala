package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based three-way equality of the connected-components
  * algorithms: for ANY random pair graph — including self-pairs,
  * duplicate pairs in both orientations, hub nodes, and disjoint
  * clusters — the driver union-find (default dispatch under the size
  * bound), distributed min-label propagation (driverMax = 0), and star
  * contraction must emit identical (doc_id, comp) labelings, and every
  * labeling must match a reference closure computed independently in
  * plain Scala. (Raw ScalaCheck runner: the scalatest bridge artifact is
  * not on the offline classpath.) */
class ComponentsPropertySpec extends SparkSpec {

  import spark.implicits._

  // random graphs over a small id universe so collisions/chains/hubs are
  // common; self-pairs and duplicates deliberately allowed
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    ids = Gen.choose(0L, 24L)
    pairs <- Gen.listOfN(n, Gen.zip(ids, ids))
  } yield pairs

  /** Independent reference: brute-force closure by repeated relabeling. */
  private def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val label = scala.collection.mutable.Map.empty[Long, Long]
    pairs.foreach { case (a, b) =>
      label.getOrElseUpdate(a, a); label.getOrElseUpdate(b, b)
    }
    var changed = true
    while (changed) {
      changed = false
      pairs.foreach { case (a, b) =>
        val m = math.min(label(a), label(b))
        if (label(a) != m) { label(a) = m; changed = true }
        if (label(b) != m) { label(b) = m; changed = true }
        // chase one level so chains converge
        val la = label(label.getOrElse(label(a), label(a)))
        if (label(a) != la) { label(a) = la; changed = true }
      }
    }
    // fully resolve
    def root(x: Long): Long = { var r = x; while (label(r) != r) r = label(r); r }
    label.keys.map(k => k -> root(k)).toMap
  }

  test("keepBest == reference representative selection on random graphs") {
    // docs 0..24 with random scores; pairs over the same universe. The
    // kept set must be: every unpaired doc, plus per component exactly
    // the max-score member (ties to the lowest id).
    val caseGen: Gen[(List[(Long, Long)], Map[Long, Long])] = for {
      pairs <- graphGen
      scores <- Gen.listOfN(25, Gen.choose(0L, 5L)) // narrow range → ties
    } yield (pairs, scores.zipWithIndex.map { case (s, i) => i.toLong -> s }.toMap)
    val prop = Prop.forAll(caseGen) { case (pairs, scores) =>
      val docs = scores.toSeq.toDF("doc_id", "score")
      val pairsDf = pairs.toDF("id1", "id2")
      val kept = Dedup.keepBest(docs, "doc_id", org.apache.spark.sql.functions.col("score"), pairsDf)
        .collect().map(_.getLong(0)).toSet
      val comps = reference(pairs)
      val byComp = comps.keys.groupBy(comps)
      val expectedReps = byComp.values.map(ids =>
        -ids.map(id => (scores(id), -id)).max._2).toSet
      val unpaired = scores.keySet -- comps.keySet
      kept == (unpaired ++ expectedReps)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(result.passed, result.toString)
  }

  test("countMin: conservation and overcount-only on random token multisets") {
    // random docs over a tiny vocabulary (heavy collisions at width 16)
    val docGen: Gen[List[String]] = for {
      n <- Gen.choose(1, 30)
      docs <- Gen.listOfN(n, Gen.listOf(Gen.oneOf(
        "a", "b", "c", "dd", "ee", "ff", "ggg", "hhh")).map(_.mkString(" ")))
    } yield docs
    val (depth, width) = (3, 16)
    val prop = Prop.forAll(docGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sketch = CountMin.buildTokens(df, "text", depth, width).collect()
      val exact = texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      // tokens() on an empty/whitespace doc yields one empty-string token
      // (the documented trim/split contract) — mirror it
      val streamN = texts.map(t => math.max(t.trim.split("\\s+").length, 1).toLong).sum
      val perRow = sketch.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
      val conserved = (0 until depth).forall(r => perRow.getOrElse(r, 0L) == streamN)
      val terms = exact.keys.toSeq.sorted
      val overOnly = terms.isEmpty || {
        val est = CountMin.estimateTerms(
          df.sparkSession.createDataFrame(
            java.util.Arrays.asList(sketch: _*),
            CountMin.buildTokens(df, "text", depth, width).schema),
          terms, depth, width)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        terms.forall(t => est(t) >= exact(t))
      }
      conserved && overOnly
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(result.passed, result.toString)
  }

  test("driver UF == min-label == star == reference closure on random graphs") {
    val prop = Prop.forAll(graphGen) { pairs =>
      val df = pairs.toDF("id1", "id2")
      def toMap(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = reference(pairs)
      val uf = toMap(Dedup.connectedComponents(df))
      val lp = toMap(Dedup.connectedComponents(df, driverMax = 0L))
      val star = toMap(Dedup.connectedComponentsStar(df))
      uf == expected && lp == expected && star == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(result.passed, result.toString)
  }
}

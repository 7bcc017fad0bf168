package graft

import org.apache.spark.sql.functions.col

import graft.kg.query.Ontology
import graft.kg.train.EmbeddingData

/** Hand-computed coverage for the ontology inference (transitive closure +
  * RDFS-style entailment) and the KG-embedding negative sampler — their
  * sf0.01 DuckDB oracles are the end-to-end gate; these pin semantics on
  * tiny fixtures.
  */
class OntologySpec extends SparkTestBase {

  test("transitiveClosure: converges to the full closure at any depth") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("child", "parent")
    val r = Ontology.transitiveClosure(edges).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(r === Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    // a deep chain is CLOSED, not silently truncated at some unroll count
    val deep = (0 until 7).map(i => (s"n$i", s"n${i + 1}")).toDF("child", "parent")
    assert(Ontology.transitiveClosure(deep).count() === 7L * 8 / 2)
    // cycles are a data bug — rejected, never entailed
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("child", "parent")
    intercept[IllegalArgumentException] { Ontology.transitiveClosure(cyc) }
  }

  test("transitiveClosure of the shipped taxonomy: leaf -> category -> root") {
    val r = Ontology.transitiveClosure(Ontology.taxonomyDf(spark)).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(r.contains(("S007", "SCAT1")))
    assert(r.contains(("S007", "Skill")))
    assert(r.contains(("LOC05", "REG1")))
    assert(r.contains(("LOC05", "Region")))
    // depth-2 taxonomy: every leaf has exactly its category and the root
    assert(r.count(_._1 == "S007") === 2)
  }

  test("entailTriples: ancestors added per object, non-taxonomy objects pass") {
    import spark.implicits._
    val t = Seq(("1", "requiresSkill", "S007"), ("1", "hasWorkload", "80-100"))
      .toDF("subj", "pred", "obj")
    val closure = Ontology.transitiveClosure(Ontology.taxonomyDf(spark))
    val r = EmbeddingFixtures.rows(Ontology.entailTriples(t, closure))
    assert(r === Set(
      ("1", "requiresSkill", "S007"), ("1", "requiresSkill", "SCAT1"),
      ("1", "requiresSkill", "Skill"), ("1", "hasWorkload", "80-100")))
  }

  test("negativeSamples: k per positive minus filtered, never a true triple") {
    import spark.implicits._
    val t = Seq(("1", "p", "A"), ("1", "p", "B"), ("2", "p", "A"))
      .toDF("subj", "pred", "obj")
    val vocab = Seq("A", "B", "C")
    val neg = EmbeddingData.negativeSamples(t, "p", vocab, k = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // determinism
    val neg2 = EmbeddingData.negativeSamples(t, "p", vocab, k = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(neg.toSet === neg2.toSet)
    // the FILTER: no emitted negative is a true (subj, obj) pair
    val truePairs = Set(("1", "A"), ("1", "B"), ("2", "A"))
    neg.foreach { case (s, _, _, on, _) =>
      assert(!truePairs.contains((s, on)), s"unfiltered negative ($s, $on)")
    }
    // subject 1 has only C as a legal negative; subject 2 has B and C —
    // every emitted row is one of those
    assert(neg.filter(_._1 == "1").forall(_._4 == "C"))
    assert(neg.filter(_._1 == "2").forall(r => r._4 == "B" || r._4 == "C"))
    // candidates are k per positive BEFORE filtering; after filtering,
    // counts are bounded by k and neg_i values stay within [0, k)
    assert(neg.forall(r => r._5 >= 0L && r._5 < 4L))
    val perPositive = neg.groupBy(r => (r._1, r._3)).view.mapValues(_.length)
    assert(perPositive.values.forall(_ <= 4))
  }

  test("negativeSamplesSubject: head corruption, filtered, decorrelated from tails") {
    import spark.implicits._
    val t = Seq(("1", "p", "A"), ("2", "p", "A"), ("3", "p", "B"))
      .toDF("subj", "pred", "obj")
    // head vocabulary as an indexed relation (the corpus-scale shape)
    val vocab = spark.range(4).select(col("id").as("vi"),
      col("id").cast("string").as("v")) // heads "0".."3"
    def run() = EmbeddingData
      .negativeSamplesSubject(t, "p", vocab, nVocab = 4L, k = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val neg = run()
    assert(neg.toSet === run().toSet) // deterministic
    // the FILTER: no emitted (subj_neg, obj) is a true head-tail pair
    val truePairs = Set(("1", "A"), ("2", "A"), ("3", "B"))
    neg.foreach { case (_, _, o, sn, _) =>
      assert(!truePairs.contains((sn, o)), s"unfiltered head negative ($sn, $o)")
    }
    assert(neg.nonEmpty && neg.forall(r => r._5 >= 0L && r._5 < 4L))
    // decorrelation from the tail half: the 's'-tagged hash must not
    // reproduce the object-side corruption index for the same (s, o, j)
    val tails = EmbeddingData
      .negativeSamples(t, "p", Seq("0", "1", "2", "3"), k = 4).collect()
      .map(r => ((r.getString(0), r.getString(2), r.getLong(4)), r.getString(3)))
      .toMap
    val heads = neg.map(r => ((r._1, r._3, r._5), r._4)).toMap
    assert(heads.keySet.intersect(tails.keySet).exists(k0 => heads(k0) != tails(k0)))
  }

  test("triplePR: hand-computed per-predicate precision/recall/F1") {
    import spark.implicits._
    val gold = Seq(("1", "p", "a"), ("2", "p", "b"), ("3", "p", "c"),
      ("1", "q", "x")).toDF("subj", "pred", "obj")
    // p: 2 tp, 1 fp, 1 fn -> P = 2/3, R = 2/3; q: missed entirely -> 0/0/0
    val predicted = Seq(("1", "p", "a"), ("2", "p", "b"), ("9", "p", "zz"))
      .toDF("subj", "pred", "obj")
    val r = graft.kg.query.Eval.triplePR(predicted, gold).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    assert(r("p") === ((3L, 3L, 2L, 666666L, 666666L, 666666L)))
    assert(r("q") === ((0L, 1L, 0L, 0L, 0L, 0L)))
    // duplicates collapse: triple-SET semantics
    val dup = predicted.union(predicted)
    assert(graft.kg.query.Eval.triplePR(dup, gold).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap.apply("p") === 3L)
  }

  test("skipGramPairs: hand-computed window-2 counts over a fixed walk") {
    import spark.implicits._
    // one walk A B C D: window 2 pairs (ordered) — (A,B),(A,C),(B,A),(B,C),
    // (B,D),(C,A),(C,B),(C,D),(D,B),(D,C); a second walk X Y adds
    // (X,Y),(Y,X); counts all 1
    val walks = Seq(
      ("w1", 0L, "A"), ("w1", 1L, "B"), ("w1", 2L, "C"), ("w1", 3L, "D"),
      ("w2", 0L, "X"), ("w2", 1L, "Y")).toDF("walk_id", "step", "node")
    val p = EmbeddingData.skipGramPairs(walks, window = 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = Seq("A" -> "B", "A" -> "C", "B" -> "A", "B" -> "C",
      "B" -> "D", "C" -> "A", "C" -> "B", "C" -> "D", "D" -> "B", "D" -> "C",
      "X" -> "Y", "Y" -> "X").map { case (a, b) => ((a, b), 1L) }.toMap
    assert(p === expected)
    // repeated co-occurrence ACCUMULATES: a third walk re-visiting A B
    val walks2 = walks.union(Seq(("w3", 0L, "A"), ("w3", 1L, "B"))
      .toDF("walk_id", "step", "node"))
    val p2 = EmbeddingData.skipGramPairs(walks2, window = 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(p2(("A", "B")) === 2L && p2(("B", "A")) === 2L)
  }
}

private object EmbeddingFixtures {
  def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
}

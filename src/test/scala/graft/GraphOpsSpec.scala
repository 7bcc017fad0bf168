package graft

import graft.kg.graph.GraphOps

/** Hand-computed coverage for the KG graph-analytics operators (their
  * sf0.01 DuckDB oracles — over the full synthetic triple relation — are the
  * end-to-end gate; these pin the arithmetic on a 4-node graph).
  *
  * Fixture: D1 mentions {A,B,C}, D2 {A,B}, D3 {C,D} →
  * undirected co-occurrence edges {A-B, A-C, B-C, C-D};
  * degrees A=2, B=2, C=3, D=1; one triangle {A,B,C}.
  */
class GraphOpsSpec extends SparkTestBase {

  private def triples = {
    import spark.implicits._
    Seq(("D1", "m", "A"), ("D1", "m", "B"), ("D1", "m", "C"),
      ("D2", "m", "A"), ("D2", "m", "B"), ("D3", "m", "C"), ("D3", "m", "D"))
      .toDF("subj", "pred", "obj")
  }

  test("coocEdges: symmetric distinct pairs, duplicate co-occurrence collapses") {
    val e = GraphOps.coocEdges(triples).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // A-B co-occurs in two docs but is ONE edge pair
    assert(e === Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A"),
      ("B", "C"), ("C", "B"), ("C", "D"), ("D", "C")))
  }

  test("components: clique+bridge collapse to one component, isolate keeps itself") {
    import spark.implicits._
    // fixture graph is ONE component (C bridges {A,B} to D); E is mentioned
    // alone in D4 → no edges → singleton component
    val t = triples.union(Seq(("D4", "m", "E")).toDF("subj", "pred", "obj"))
    val c = GraphOps.components(t).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(c === Set(("A", "A"), ("B", "A"), ("C", "A"), ("D", "A"), ("E", "E")))
  }

  test("pagerank: one hand-unrolled integer iteration") {
    val r = GraphOps.pagerank(triples, iters = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // contributions: A,B floor(850000/2)=425000; C floor(850000/3)=283333;
    // D 850000. r1 = 150000 + sum(in-contributions)
    assert(r === Map("A" -> 858333L, "B" -> 858333L,
      "C" -> 1850000L, "D" -> 433333L))
  }

  test("triangles: degree-ordered enumeration finds the one triangle, thrice") {
    val t = GraphOps.triangles(triples).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t === Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
  }
}

package graft

import graft.kg.expr.JaroWinkler.jaroWinkler
import graft.kg.expr.JaroWinklerAlgo
import graft.kg.io.Dictionaries

/** SURVEY.md §5.3 — expression unit tests: the Catalyst expression (eval and
  * codegen paths) agrees with the scalar oracle, the algorithm matches
  * published Jaro-Winkler values, and every corpus typo argmax-links to its
  * own canonical title at the 0.90 threshold (the assumption the kg_canonical
  * DuckDB oracle is built on).
  */
class JaroWinklerSpec extends SparkTestBase {

  test("published golden values") {
    // Classic textbook pairs (values from the standard JW definition).
    assert(math.abs(JaroWinklerAlgo.similarity("MARTHA", "MARHTA") - 0.9611) < 1e-3)
    assert(math.abs(JaroWinklerAlgo.similarity("DIXON", "DICKSONX") - 0.8133) < 1e-3)
    assert(math.abs(JaroWinklerAlgo.similarity("JELLYFISH", "SMELLYFISH") - 0.8962) < 1e-3)
    assert(JaroWinklerAlgo.similarity("abc", "abc") == 1.0)
    assert(JaroWinklerAlgo.similarity("", "abc") == 0.0)
    assert(JaroWinklerAlgo.similarity("abc", "xyz") == 0.0)
  }

  test("DuckDB-parity conventions: floored transpositions, 0.7 boost threshold") {
    // values are DuckDB jaro_winkler_similarity outputs, checked offline;
    // bit-identical parity >= 0.9 is what the kg_triples_full oracle rests on
    assert(JaroWinklerAlgo.similarity("Data Scienist", "Data Scientist")
      == 0.9703296703296703) // raw transpositions 3 -> t = 1 (floored), not 1.5
    assert(JaroWinklerAlgo.similarity("Sofware Engineer", "Scrum Master")
      == 0.5138888888888888) // jaro < 0.7 -> no prefix boost despite common 'S'
  }

  test("symmetry and range on random strings (seeded property loop)") {
    val rnd = new scala.util.Random(42)
    def randStr(): String =
      (0 until rnd.nextInt(13)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 500).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val s = JaroWinklerAlgo.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range for ($a, $b)")
      assert(math.abs(s - JaroWinklerAlgo.similarity(b, a)) < 1e-12, s"asymmetric for ($a, $b)")
    }
  }

  test("Catalyst expression (codegen path) equals scalar oracle") {
    import spark.implicits._
    val pairs = (for {
      (c, v, t) <- Dictionaries.titles
      x <- Seq(c, v, t); y <- Seq(c, v, t)
    } yield (x, y)).distinct
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", jaroWinkler($"a", $"b").as("jw"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(math.abs(got((a, b)) - JaroWinklerAlgo.similarity(a, b)) < 1e-12,
        s"expr vs oracle mismatch for ($a, $b)")
    }
  }

  test("every corpus typo argmax-links to its own canonical title at >= 0.90") {
    val allSurfaces = Dictionaries.gazTitles.map(g => (g.surface, g.entity_id))
    Dictionaries.titles.zipWithIndex.foreach { case ((_, _, typo), i) =>
      val scored = allSurfaces.map { case (s, id) =>
        (id, s, JaroWinklerAlgo.similarity(typo, s))
      }
      val best = scored.maxBy(x => (x._3, x._2))
      assert(best._1 == Dictionaries.titleId(i),
        s"typo '$typo' best-matched ${best._2} (${best._1}) not its canonical")
      assert(best._3 >= 0.90, s"typo '$typo' best score ${best._3} below threshold")
      // no cross-entity surface also clears the threshold with a higher score
      val rivals = scored.filter(x => x._1 != Dictionaries.titleId(i) && x._3 >= best._3)
      assert(rivals.isEmpty, s"typo '$typo' has rival links $rivals")
    }
  }
}

package graft

import graft.kg.expr.AhoCorasickTrie
import graft.kg.io.Dictionaries

/** Trie matcher vs a naive scan oracle (SURVEY.md §5.3). */
class AhoCorasickSpec extends SparkTestBase {

  private val patterns = Dictionaries.gazSkills.map(g => (g.surface, g.entity_id))
  private val trie = AhoCorasickTrie.build(patterns)

  private def naive(text: String): Set[(String, String, Int)] =
    (for {
      (surface, id) <- patterns
      start <- 0 to text.length - surface.length
      if text.regionMatches(start, surface, 0, surface.length)
      if start == 0 || !Character.isLetterOrDigit(text.charAt(start - 1))
      end = start + surface.length
      if end == text.length || !Character.isLetterOrDigit(text.charAt(end))
    } yield (surface, id, start)).toSet

  test("hand cases: boundaries, overlaps, multi-token") {
    assert(trie.matches("Erfahrung mit Java").toSet == naive("Erfahrung mit Java"))
    assert(trie.matches("JavaScript ist nicht Java").toSet ==
      naive("JavaScript ist nicht Java"))
    assert(trie.matches("SAP HANA und Power BI").toSet == naive("SAP HANA und Power BI"))
    assert(trie.matches("").isEmpty)
    assert(trie.matches("nothing matches here").isEmpty)
    // substring of a pattern at word boundary must not match
    assert(trie.matches("Jav und Pyth").isEmpty)
  }

  test("seeded random texts match naive oracle") {
    val rnd = new scala.util.Random(13)
    val vocab = Dictionaries.skills ++ Seq("und", "mit", "the", "fast", "x", "Javax", "aJava")
    (0 until 300).foreach { _ =>
      val words = (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
      val text = words.mkString(" ")
      assert(trie.matches(text).toSet == naive(text), s"text: '$text'")
    }
  }
}

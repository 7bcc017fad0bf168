package graft.kg.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Plain-Scala Jaro-Winkler similarity (Winkler's original definition: Jaro
  * similarity plus common-prefix bonus, prefix capped at 4, scaling 0.1,
  * bonus applied only when jaro >= 0.7, transpositions = floor(raw/2) — the
  * same conventions as Apache Commons Text and DuckDB's
  * `jaro_winkler_similarity`, verified bit-identical against DuckDB on the
  * dictionary pairs and a 3k-pair fuzz set for every value >= 0.9; this is
  * what lets the kg_triples_full oracle state fuzzy-link scores in SQL).
  * Public so generated code can call it statically (see
  * [[JaroWinkler.doGenCode]]).
  *
  * Reference semantics: the JobAnnotations pipeline scores fuzzy candidate ↔
  * dictionary matches with Jaro-Winkler / Levenshtein (SURVEY.md §2.1 R10,
  * BASELINE.json:6); the reference checkout is empty so this follows the
  * published algorithm, pinned by ScalaTest goldens.
  */
object JaroWinklerAlgo {
  def similarity(s1: String, s2: String): Double = {
    if (s1.equals(s2)) return 1.0
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = (transpositions / 2).toDouble // floor, per Winkler/Commons/DuckDB
    val m = matches.toDouble
    val jaro = (m / len1 + m / len2 + (m - t) / m) / 3.0
    if (jaro < 0.7) return jaro // boost threshold, per Winkler's original
    var prefix = 0
    val maxPrefix = math.min(4, math.min(len1, len2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Catalyst expression `jaro_winkler(left, right): double`.
  *
  * Codegen-enabled (participates in whole-stage codegen: the generated code
  * calls [[JaroWinklerAlgo.similarity]] directly), null-intolerant, foldable
  * when both children are literals (so constant folding applies).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.similarity(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.kg.expr.JaroWinklerAlgo.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}

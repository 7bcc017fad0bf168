package graft.kg.expr

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serializable Aho-Corasick automaton over (surface, entity_id) patterns.
  *
  * This is the "compiled trie matcher" of SURVEY.md §2.1 R4: the reference
  * loads its dictionaries into in-memory structures reused across documents
  * (SURVEY.md §3.1); here the automaton is built once on the driver from the
  * broadcastable gazetteer and shipped to executors as a Broadcast value, so
  * each span is matched in O(len(text) + #matches) regardless of dictionary
  * size — the scale path when gazetteers grow past n-gram-join friendliness.
  *
  * Matches are emitted only at word boundaries (preceding/following char not
  * a letter or digit), which makes the trie plan result-equal to the
  * whitespace-n-gram broadcast-join plan on space-separated text — asserted
  * by a plan-equality test and by both plans sharing one DuckDB oracle.
  */
final class AhoCorasickTrie private (
    val goto_ : Array[Map[Char, Int]],
    val fail: Array[Int],
    // output patterns per node: (surface, entity_id, patternLength)
    val out: Array[List[(String, String, Int)]])
    extends Serializable {

  /** All word-boundary matches in `text` as (surface, entity_id, startPos). */
  def matches(text: String): Seq[(String, String, Int)] = {
    val res = mutable.ArrayBuffer.empty[(String, String, Int)]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !goto_(state).contains(c)) state = fail(state)
      state = goto_(state).getOrElse(c, 0)
      if (out(state).nonEmpty) {
        out(state).foreach { case (surface, entityId, plen) =>
          val start = i - plen + 1
          val boundedLeft = start == 0 || !Character.isLetterOrDigit(text.charAt(start - 1))
          val boundedRight = i == text.length - 1 || !Character.isLetterOrDigit(text.charAt(i + 1))
          if (boundedLeft && boundedRight) res += ((surface, entityId, start))
        }
      }
      i += 1
    }
    res.toSeq
  }
}

object AhoCorasickTrie {
  def build(patterns: Seq[(String, String)]): AhoCorasickTrie = {
    val goto_ = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outB = mutable.ArrayBuffer(List.empty[(String, String, Int)])
    patterns.foreach { case (surface, entityId) =>
      var node = 0
      surface.foreach { c =>
        node = goto_(node).getOrElseUpdate(c, {
          goto_ += mutable.Map.empty[Char, Int]
          outB += Nil
          goto_.length - 1
        })
      }
      outB(node) = (surface, entityId, surface.length) :: outB(node)
    }
    val fail = new Array[Int](goto_.length)
    val queue = mutable.Queue.empty[Int]
    goto_(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      goto_(u).foreach { case (c, v) =>
        queue += v
        var f = fail(u)
        while (f != 0 && !goto_(f).contains(c)) f = fail(f)
        fail(v) = if (goto_(f).contains(c) && goto_(f)(c) != v) goto_(f)(c) else 0
        outB(v) = outB(v) ++ outB(fail(v))
      }
    }
    new AhoCorasickTrie(goto_.map(_.toMap).toArray, fail, outB.toArray)
  }
}

/** Catalyst expression `aho_matches(text): array<struct<surface,entity_id,pos>>`
  * over a broadcast [[AhoCorasickTrie]]. Eval-only (CodegenFallback): the heavy
  * lifting is the automaton itself; the n-gram broadcast-join plan is the
  * codegen'd alternative and both are kept result-equal.
  */
case class AhoCorasickMatches(child: Expression, trie: Broadcast[AhoCorasickTrie])
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "aho_matches"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("surface", StringType, nullable = false),
    StructField("entity_id", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val ms = trie.value.matches(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(ms.map { case (s, e, p) =>
      InternalRow(UTF8String.fromString(s), UTF8String.fromString(e), p)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasickMatches {
  /** Broadcast the automaton once; reuse the returned matcher across queries. */
  def matcher(spark: SparkSession, patterns: Seq[(String, String)]): Column => Column = {
    val bc = spark.sparkContext.broadcast(AhoCorasickTrie.build(patterns))
    (text: Column) =>
      Bridge.column(AhoCorasickMatches(Bridge.expression(text), bc))
  }
}

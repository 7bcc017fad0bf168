package graft.kg.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.kg.expr.JaroWinkler.jaroWinkler

/** R10/R11 — fuzzy entity-link scoring + argmax (SURVEY.md §2.1).
  *
  * The similarity join is a *blocked* theta join reduced to a broadcast
  * equi-join (SparkER pattern, PAPERS.md): candidates and dictionary surfaces
  * are joined on a cheap blocking key (first character + a length band), the
  * Jaro-Winkler predicate is evaluated only within blocks, and the best match
  * per candidate is selected with a deterministic ranking window. Never a raw
  * cross join — a plan-shape test asserts BroadcastHashJoin.
  */
object Linking {

  /** Blocking key: first char. Length banding is applied as a residual
    * predicate (|len(a)-len(b)| <= band) after the equi-join.
    */
  private def blockKey(c: Column): Column = substring(c, 1, 1)

  /** Fuzzy-link `cands(doc_id, candidate, offset)` against
    * `dict(entity_id, surface, ...)` (broadcastable). Keeps links with
    * jaro_winkler >= threshold; one best link per (doc_id, offset), ties
    * broken deterministically (higher score, then surface).
    * Output: (doc_id, offset, entity_id, surface, score).
    */
  def fuzzyLink(
      cands: DataFrame,
      dict: DataFrame,
      threshold: Double = 0.90,
      lengthBand: Int = 6): DataFrame = {
    val jw = jaroWinkler(col("candidate"), col("surface"))
    val w = Window.partitionBy(col("doc_id"), col("offset"))
      .orderBy(col("score").desc, col("surface").asc)
    cands
      .join(broadcast(dict.withColumn("bk", blockKey(col("surface")))),
        blockKey(col("candidate")) === col("bk") &&
          abs(length(col("candidate")) - length(col("surface"))) <= lengthBand)
      .withColumn("score", jw)
      .where(col("score") >= threshold)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("offset"), col("candidate"), col("entity_id"),
        col("surface"), col("score"))
  }

  /** Exact + fuzzy linking of candidate surfaces: exact broadcast equi-join
    * first (score 1.0); only the exact-miss remainder (left_anti) pays the
    * fuzzy path. Output: (doc_id, offset, entity_id, score).
    */
  def linkCandidates(
      cands: DataFrame,
      dict: DataFrame,
      threshold: Double = 0.90): DataFrame = {
    val exact = cands
      .join(broadcast(dict), col("candidate") === col("surface"))
      .select(col("doc_id"), col("offset"), col("entity_id"), lit(1.0).as("score"))
    val misses = cands.join(broadcast(dict), col("candidate") === col("surface"), "left_anti")
    val fuzzy = fuzzyLink(misses, dict, threshold)
      .select(col("doc_id"), col("offset"), col("entity_id"), col("score"))
    exact.unionByName(fuzzy)
  }
}

package graft.kg.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.kg.expr.JaroWinkler.jaroWinkler

/** R10/R11 — fuzzy entity-link scoring + argmax (SURVEY.md §2.1). Two scoring
  * paths per BASELINE.json:6 ("Jaro-Winkler/Levenshtein entity-link
  * scoring"): the custom codegen'd [[graft.kg.expr.JaroWinkler]] expression,
  * and the BUILT-IN `levenshtein` normalized to a similarity.
  *
  * The similarity join is a *blocked* theta join reduced to a broadcast
  * equi-join (SparkER pattern, PAPERS.md): candidates and dictionary surfaces
  * are joined on a cheap blocking key (first character + a length band), the
  * similarity predicate is evaluated only within blocks, and the best match
  * per candidate is selected with one min_by hash-agg (map-side partial agg;
  * a ranking window would cost an extra sort). Never a raw cross join — a
  * plan-shape test asserts BroadcastHashJoin.
  */
object Linking {

  /** Blocking key: first char. Length banding is applied as a residual
    * predicate (|len(a)-len(b)| <= band) after the equi-join.
    */
  private def blockKey(c: Column): Column = substring(c, 1, 1)

  /** Blocked similarity join + per-(doc_id, offset) argmax; `score` is any
    * similarity expression over (candidate, surface), evaluated only within
    * blocks. Ties broken deterministically (higher score, then surface asc).
    * Output: (doc_id, offset, candidate, entity_id, surface, score).
    */
  private def blockedLink(
      cands: DataFrame,
      dict: DataFrame,
      score: Column,
      threshold: Double,
      lengthBand: Int): DataFrame =
    cands
      .join(broadcast(dict.withColumn("bk", blockKey(col("surface")))),
        blockKey(col("candidate")) === col("bk") &&
          abs(length(col("candidate")) - length(col("surface"))) <= lengthBand)
      .withColumn("score", score)
      .where(col("score") >= threshold)
      .groupBy(col("doc_id"), col("offset"))
      .agg(min_by(
        struct(col("candidate"), col("entity_id"), col("surface"), col("score")),
        struct((-col("score")).as("ns"), col("surface"))).as("best"))
      .select(col("doc_id"), col("offset"), col("best.candidate").as("candidate"),
        col("best.entity_id").as("entity_id"), col("best.surface").as("surface"),
        col("best.score").as("score"))

  /** Jaro-Winkler fuzzy link of `cands(doc_id, candidate, offset)` against
    * `dict(entity_id, surface, ...)` (broadcastable).
    */
  def fuzzyLink(
      cands: DataFrame,
      dict: DataFrame,
      threshold: Double = 0.90,
      lengthBand: Int = 6): DataFrame =
    blockedLink(cands, dict, jaroWinkler(col("candidate"), col("surface")),
      threshold, lengthBand)

  /** Levenshtein fuzzy link: similarity = 1 - lev(a,b)/max(|a|,|b|) via the
    * built-in (codegen'd) `levenshtein`. Same blocking and argmax as
    * [[fuzzyLink]]. The default threshold (0.80) is looser than JW's 0.90
    * because plain Levenshtein charges a character TRANSPOSITION two edits
    * (JW and Damerau-Levenshtein charge ~one): "UX Desinger" → "UX Designer"
    * is 1 - 2/11 ≈ 0.82.
    */
  def fuzzyLinkLev(
      cands: DataFrame,
      dict: DataFrame,
      threshold: Double = 0.80,
      lengthBand: Int = 6): DataFrame =
    blockedLink(cands, dict,
      lit(1.0) - levenshtein(col("candidate"), col("surface")).cast("double") /
        greatest(length(col("candidate")), length(col("surface"))).cast("double"),
      threshold, lengthBand)

  /** Exact + fuzzy linking of candidate surfaces: exact broadcast equi-join
    * first (score 1.0); only the exact-miss remainder (left_anti) pays the
    * fuzzy path. Output: (doc_id, offset, entity_id, score).
    */
  def linkCandidates(
      cands: DataFrame,
      dict: DataFrame,
      threshold: Double = 0.90): DataFrame =
    linkWith(cands, dict, fuzzyLink(_, _, threshold))

  /** [[linkCandidates]] with the Levenshtein scoring path. */
  def linkCandidatesLev(
      cands: DataFrame,
      dict: DataFrame,
      threshold: Double = 0.80): DataFrame =
    linkWith(cands, dict, fuzzyLinkLev(_, _, threshold))

  private def linkWith(
      cands: DataFrame,
      dict: DataFrame,
      fuzzy: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val exact = cands
      .join(broadcast(dict), col("candidate") === col("surface"))
      .select(col("doc_id"), col("offset"), col("entity_id"), lit(1.0).as("score"))
    val misses = cands.join(broadcast(dict), col("candidate") === col("surface"), "left_anti")
    exact.unionByName(
      fuzzy(misses, dict)
        .select(col("doc_id"), col("offset"), col("entity_id"), col("score")))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over the
  * `documents` table. All pure built-ins (codegen'd); outputs are strings /
  * bigints (scaled by 1e4 where fractional) so the DuckDB oracles compare
  * exactly — no float round-trip.
  */
object TextOps {

  /** Stopword list shared with the DuckDB oracle. */
  val stopwords: Seq[String] = Seq("the", "a", "und", "mit")

  /** Token counting: whitespace tokens + a word-regex token count
    * (the BPE-ish lower-alpha run count).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_word_tokens"))

  /** Quality scoring: stopword ratio, mean token length, and a simple
    * composite score; fixed-point (x1e4, floored) for exact oracle parity.
    * score = (1 - stop_ratio) * min(n_tokens, 64)/64.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long")
    val sumLen = expr(
      "aggregate(transform(split(text, ' '), t -> cast(length(t) as bigint)), " +
        "cast(0 as bigint), (acc, x) -> acc + x)")
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      nTok.as("n_tokens"),
      floor(lit(10000.0) * nStop / nTok).cast("long").as("stop_ratio_e4"),
      floor(lit(10000.0) * sumLen / nTok).cast("long").as("avg_token_len_e4"),
      floor(lit(10000.0) * (lit(1.0) - lit(1.0) * nStop / nTok)
        * least(nTok, lit(64L)) / 64.0).cast("long").as("quality_e4"))
  }

  /** Marker dictionary for [[langId]]: (token, lang). Shared VERBATIM with
    * the DuckDB oracle (OpsEntries embeds it as a VALUES list) — change both
    * together. A real deployment swaps in a trained n-gram profile table
    * through the same broadcast-join machinery; the harness corpus is
    * synthetic filler (only 'the'/'a' occur), so prediction accuracy is not
    * the point here — the distributed shape and the exact oracle are.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "of" -> "en", "and" -> "en", "is" -> "en",
    "und" -> "de", "der" -> "de", "die" -> "de", "das" -> "de", "mit" -> "de",
    "le" -> "fr", "la" -> "fr", "et" -> "fr", "les" -> "fr", "est" -> "fr",
    "el" -> "es", "los" -> "es", "las" -> "es", "es" -> "es", "por" -> "es")

  /** Language-ID by broadcast marker-dictionary scoring: token occurrences
    * join the broadcast markers table, per-(doc, lang) occurrence counts,
    * then a min_by argmax (score desc, lang asc tie-break — an aggregation,
    * not a ranking window; same R11 rationale as the pipeline argmax). Docs
    * hitting no marker predict 'unknown'. Scan → broadcast join → two
    * hash-aggs: the shape that holds when both the corpus and the dictionary
    * grow (a per-language exists() column would re-plan per dictionary
    * change and stop scaling past a handful of languages).
    */
  /** The marker-scoring argmax behind [[langId]], usable on any
    * (doc_id, text) relation (the curation gate runs it over the derived
    * dedup corpus, which has no `lang` column). Docs hitting no marker are
    * ABSENT — callers coalesce to 'unknown'. Output: (doc_id, pred_lang,
    * score).
    */
  def predLang(rel: DataFrame): DataFrame = {
    val session = rel.sparkSession
    import session.implicits._
    val markers = langMarkers.toDF("token", "mlang")
    rel.select(col("doc_id").cast("long").as("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .join(broadcast(markers), "token")
      .groupBy(col("doc_id"), col("mlang")).agg(count(lit(1)).as("score"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("mlang"), col("score")),
        struct((-col("score")).as("ns"), col("mlang"))).as("b"))
      .select(col("doc_id"), col("b.mlang").as("pred_lang"), col("b.score").as("score"))
  }

  def langId(docs: DataFrame): DataFrame = {
    val best = predLang(docs)
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("unknown")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"),
        when(coalesce(col("pred_lang"), lit("unknown")) === col("lang"), 1L)
          .otherwise(0L).as("is_match"))
  }

  /** Document fingerprinting: exact-dup key (md5) + a position-weighted
    * rolling hash over token lengths (kept trivially SQL-mirrorable; the
    * production-strength variant is xxhash64 over the raw text, also
    * emitted).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      md5(col("text")).as("md5"),
      (expr("aggregate(transform(split(text, ' '), (t, i) -> cast((i + 1) * length(t) as bigint)), " +
        "cast(0 as bigint), (acc, x) -> acc + x)") % 1000000007L).as("rolling"),
      xxhash64(col("text")).as("xx64"))

  /** End-to-end corpus CURATION — the compound operator a training-data
    * pipeline actually runs: per-doc stats ([[quality]] + [[predLang]]) over
    * the derived dedup corpus, an exact integer/string gate
    * (quality_e4 ≥ min AND predicted language allowed), then the full dedup
    * DECISION ([[graft.ops.Dedup.dupClusters]]: exact collapse → MinHash-LSH
    * → connected components) over the SURVIVORS of the gate, emitting only
    * each duplicate cluster's keeper. Every stage is a relation the earlier
    * queries verify in isolation; this query verifies their COMPOSITION
    * against one DuckDB oracle (gate replicated in SQL, dedup via the
    * recursive-CTE reachability construction). Gate thresholds are
    * fixed-point integers / strings so the cut is bit-exact on both sides.
    * Output: (doc_id, pred_lang, n_tokens, quality_e4) of kept docs.
    */
  def curate(docs: DataFrame, minQualityE4: Long = 7000L,
      langs: Seq[String] = Seq("en")): DataFrame = {
    val corpus = Dedup.derivedCorpus(docs)
    val stats = quality(corpus).select("doc_id", "n_tokens", "quality_e4")
    val lang = predLang(corpus).select("doc_id", "pred_lang")
    val kept = corpus.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(stats, "doc_id")
      .join(lang, Seq("doc_id"), "left")
      .withColumn("pred_lang", coalesce(col("pred_lang"), lit("unknown")))
      .where(col("quality_e4") >= minQualityE4 &&
        col("pred_lang").isin(langs.map(x => x: Any): _*))
    val keepers = Dedup.dupClusters(kept.select(col("doc_id"), col("text")))
      .where(col("is_dup") === 0L).select("doc_id")
    kept.join(keepers, "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("n_tokens"), col("quality_e4"))
  }
}

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

  /** Language-ID by marker-token heuristic (deterministic; the harness corpus
    * is synthetic filler text, so the value here is the distributed
    * machinery + exact oracle, not linguistic accuracy).
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val pred = when(exists(toks, _ === "the") || exists(toks, _ === "a"), "en")
      .when(exists(toks, _ === "und"), "de")
      .otherwise("unknown")
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      pred.as("pred_lang"),
      when(pred === col("lang"), 1L).otherwise(0L).as("is_match"))
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
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword-search scoring over the `documents` table — the retrieval side of
  * a training-data pipeline (query-focused corpus slicing, contamination
  * checks against eval sets, boosted sampling of on-topic documents).
  *
  * BM25 (Robertson et al., TREC-3) with k1 = 1.2 = 6/5 and b = 0.75 = 3/4,
  * restated in EXACT integer arithmetic so the DuckDB oracle hash-matches:
  *
  *   tf-part  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *            = 22·tf·A / (10·tf·A + 3·A + 9·dl·N)          with avgdl = A/N
  *   idf-part = (N − df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1)
  *              — the ODDS inside BM25's log; the log is dropped so the
  *              per-term score stays rational (the log is a monotone
  *              transform, so per-term ranking is unchanged; a production
  *              deployment that wants the exact log-BM25 total swaps a
  *              double `ln` into the same plan).
  *   score_e4 = Σ_terms (10⁴ · idf_num · 22·tf·A) div (idf_den · (10·tf·A + 3·A + 9·dl·N))
  *
  * Every factor is a BIGINT and the single `div` per term is exact integer
  * floor-division on positives in both engines (Spark `div`, DuckDB `//`) —
  * no transcendentals, no float summation order, bit-identical across
  * engines. Overflow envelope: |numerator| ≤ 10⁴·2N·22·tf·A; with tf ≤ 10³
  * this fits int64 up to N·A ≈ 2·10¹⁰ (far beyond the bench scales); the
  * production double variant has no such bound.
  *
  * Plan shape (point query, |Q| small): ONE corpus scan; per-row tf via a
  * higher-order `filter` over the token array against an exploded literal
  * term list (map-side ×|Q| fan-out, NO full-token explode and NO shuffle
  * before the per-term aggregates); df is a |Q|-row hash-agg broadcast back;
  * corpus stats (N, A) are a 1-row agg broadcast. Final top-k is
  * TakeOrderedAndProject (never a full sort). For large |Q| or query
  * *batches*, the inverted-index shape (explode all tokens once, equi-join
  * the term list) wins — that shape is what [[TextOps.predLang]] already
  * demonstrates; this operator deliberately shows the scan-side alternative.
  */
object Search {

  /** Default query: one rare + two common corpus terms (df ≈ 25/385/394 of
    * 500 at sf0.01) so the idf factor demonstrably reorders results. Shared
    * verbatim with the DuckDB oracle (OpsEntries) — change both together.
    */
  val defaultTerms: Seq[String] = Seq("dup", "spark", "join")

  /** Top-k documents by integer BM25 over `terms`.
    * Output: (doc_id, score_e4, n_terms) — n_terms = how many distinct query
    * terms the document matched.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = defaultTerms,
      k: Int = 20): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      split(col("text"), " ").as("ts"))
    // corpus stats: 1 row, broadcast — N docs, A total tokens
    val stats = base.agg(count(lit(1)).as("n"),
      sum(size(col("ts")).cast("long")).as("a"))
    // per-(doc, term) tf without exploding tokens: HOF filter per literal term
    val tf = base
      .select(col("doc_id"), size(col("ts")).cast("long").as("dl"), col("ts"),
        explode(typedlit(terms)).as("term"))
      .withColumn("tf", size(expr("filter(ts, x -> x = term)")).cast("long"))
      .where(col("tf") > 0)
      .drop("ts")
    // document frequency per term: |Q| rows, broadcast
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        expr("(10000 * (2*n - 2*df + 1) * 22 * tf * a) div " +
          "((2*df + 1) * (10*tf*a + 3*a + 9*dl*n))").as("sc"))
      .groupBy(col("doc_id"))
      .agg(sum(col("sc")).as("score_e4"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_e4").desc, col("doc_id").asc)
      .limit(k)
  }
}

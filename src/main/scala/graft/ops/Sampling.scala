package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the data-mixing step of a training-data
  * pipeline (per-language / per-source mixture weights, held-out split
  * carving, downsampling boilerplate-heavy strata). Sampling at 100 TB must
  * be (a) deterministic and re-runnable (a re-run of the job selects the SAME
  * rows — no RNG state, no `rand()`), (b) map-side (a sample is a filter, it
  * must never shuffle the corpus), and (c) stratum-aware (rates are per-key,
  * not global). Both operators key their decision on a salted md5 of the
  * STABLE doc_id — the same portable-hash construction the dedup family uses
  * (Dedup.portableBaseHash), so the DuckDB oracles replicate the exact
  * selection bit-for-bit.
  */
object Sampling {

  /** Per-language keep rates in 1e4 fixed point (en 50%, de/fr 25%,
    * es/zh 10%) — the "target mixture" a multilingual pretraining corpus
    * would configure. Shared verbatim with the DuckDB oracle (OpsEntries) —
    * change both together.
    */
  val defaultRates: Seq[(String, Long)] = Seq(
    ("en", 5000L), ("de", 2500L), ("fr", 2500L), ("es", 1000L), ("zh", 1000L))

  /** Deterministic sampling bucket in [0, 10000): the 60-bit md5 integer of
    * the salted doc id, mod 10⁴. The "smp:" salt decorrelates this hash from
    * every other md5-of-doc_id use in the pipeline (a doc's sampling fate
    * must not correlate with its dedup bucket).
    */
  private[graft] def bucket(docId: Column): Column =
    conv(substring(md5(concat(lit("smp:"), docId.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10000L

  /** Rate-based stratified Bernoulli sample: keep a doc iff its bucket falls
    * below its language's rate. Plan: scan → broadcast-join the |langs|-row
    * rate table → filter — purely map-side, zero shuffles, trivially
    * embarrassing-parallel at any corpus size. Languages absent from `rates`
    * are dropped (rate 0) by the inner join.
    * Output: (doc_id, lang, bucket).
    */
  def stratifiedSample(docs: DataFrame,
      rates: Seq[(String, Long)] = defaultRates): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val r = rates.toDF("lang", "rate_e4")
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        bucket(col("doc_id")).as("bucket"))
      .join(broadcast(r), "lang")
      .where(col("bucket") < col("rate_e4"))
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  /** Exact-size stratified sample: the k docs per language with the SMALLEST
    * sampling buckets (ties by doc_id) — "give me exactly k docs per
    * stratum", deterministically. This is bottom-k-per-key, i.e. the same
    * hot-key ranking problem as [[Similarity.batchTopK]]: a language is a
    * huge partition at corpus scale, so a single ranking window would sort a
    * whole stratum on one task. Two-level salted ranking instead: a salted
    * window keeps ≤ k rows per (lang, salt) — each task sorts ~|stratum|/salts
    * rows — then the final window ranks only ≤ k·salts survivors per lang.
    * Output: (doc_id, lang, rank), rank ∈ [1, k] by (bucket, doc_id).
    */
  def stratifiedTopK(docs: DataFrame, k: Int = 40, salts: Int = 16): DataFrame = {
    val withB = docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
      bucket(col("doc_id")).as("bucket"))
    val ord = Seq(col("bucket").asc, col("doc_id").asc)
    val wSalted = Window.partitionBy(col("lang"), col("salt")).orderBy(ord: _*)
    val wFinal = Window.partitionBy(col("lang")).orderBy(ord: _*)
    withB
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
      .withColumn("prerank", row_number().over(wSalted))
      .where(col("prerank") <= k)
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("lang"), col("rank").cast("long").as("rank"))
  }

  /** The budget-fill bucket hash: same 60-bit-md5-mod-10⁴ construction as
    * [[bucket]], "bud:"-salted so a doc's budget fate is independent of its
    * Bernoulli-sampling bucket.
    */
  private[graft] def budgetBucket(docId: Column): Column =
    conv(substring(md5(concat(lit("bud:"), docId.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10000L

  /** TOKEN-BUDGET sampling — "give me ≤ B training tokens per source,
    * deterministically": the mixture knob real pretraining runs configure is
    * a token budget per domain, not a document count ([[stratifiedTopK]]) or
    * a rate ([[stratifiedSample]]). Semantics: order each source's docs by
    * (budget-bucket, doc_id) — a deterministic shuffle — and keep the prefix
    * whose running token total stays ≤ B.
    *
    * A prefix sum is inherently sequential per stratum, so the naive plan
    * (one ranking window per source) sorts a WHOLE source on one task —
    * exactly the hot-stratum failure [[stratifiedTopK]] avoids. This is the
    * two-phase restatement:
    *   1. per-(source, bucket) token totals: one hash-agg to a relation of
    *      ≤ |sources|·10⁴ rows — metadata-scale at ANY corpus size;
    *   2. bucket-level running totals over that tiny relation (the only
    *      full-stratum ordering, 10⁴ rows per source);
    *   3. docs in buckets whose running total fits keep UNCONDITIONALLY —
    *      no doc-level ordering ever touches them (the bulk of the corpus);
    *   4. only the single BOUNDARY bucket per source (~1/10⁴ of the stratum)
    *      gets a doc-level running-sum window, partitioned by
    *      (source, bucket).
    * The kept set is IDENTICAL to the naive single-window definition (the
    * DuckDB oracle states it that way); the doc-level cum_tokens column is
    * reconstructed as bucket-prefix + within-bucket running sum.
    *
    * Output: (doc_id, source, n_tokens, cum_tokens) for kept docs, where
    * cum_tokens ≤ budget is the doc's position in the source's running
    * total.
    */
  def tokenBudget(docs: DataFrame, budget: Long = 600L): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      budgetBucket(col("doc_id")).as("bucket"))
    // phase 1+2: bucket histogram + bucket-level running totals (tiny)
    val wB = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val bcum = base.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("cum", sum(col("bt")).over(wB))
      .withColumn("prior", col("cum") - col("bt"))
    // phase 3: docs in fully-fitting buckets need only their within-bucket
    // running sum to report cum_tokens (window key (source, bucket) —
    // ~1/10⁴ of a stratum per partition)
    val wDoc = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = base.join(bcum, Seq("source", "bucket"))
      .withColumn("cum_tokens", col("prior") + sum(col("n_tokens")).over(wDoc))
    // full buckets pass outright; the boundary bucket keeps its fitting
    // prefix — together exactly the docs with cum_tokens <= budget
    joined
      .where(col("cum") <= budget ||
        (col("prior") < budget && col("cum_tokens") <= budget))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }
}

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
}

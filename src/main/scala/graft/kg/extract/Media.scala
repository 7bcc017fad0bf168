package graft.kg.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal span handling. Media spans are opaque references
  * (`media_ref`) interleaved with text spans; they participate in the
  * span-order invariant and are skipped by text extractors.
  *
  * ==STUB NOTE==
  * Real image/audio decode libraries are not present in this container, so
  * [[decodeStub]] is a clearly-marked deterministic FAKE decoder: it derives
  * "metadata" purely from the parsed media_ref ids. The Spark-side plumbing —
  * schema, per-span batching, partition-parallel evaluation — is real: swap
  * `decodeStub` for a mapPartitions/Arrow-batch decoder (one codec instance
  * per partition, binary column in, metadata struct out) on a cluster with
  * codecs installed. Everything else in this file stays unchanged.
  */
object Media {

  private val RefRe = "img://(\\d+)/(\\d+)"

  /** Deterministic fake decode of a media_ref → (width, height) longs. */
  def decodeStub(mediaRef: Column): Column = {
    val d = regexp_extract(mediaRef, RefRe, 1).cast("long")
    val i = regexp_extract(mediaRef, RefRe, 2).cast("long")
    struct(
      (lit(320) + lit(32) * ((d + i) % 5)).cast("long").as("width"),
      (lit(240) + lit(24) * ((d + i) % 7)).cast("long").as("height"))
  }

  /** (subj, media_ref, width, height) for every media span. */
  def metadata(postings: DataFrame): DataFrame = {
    val m = Extractors.mediaSpans(postings)
    val meta = decodeStub(col("media_ref"))
    m.select(col("doc_id").as("subj"), col("media_ref"),
      meta.getField("width").as("width"), meta.getField("height").as("height"))
  }

  /** Fake feature-extraction kernels over decoded media (same stub boundary
    * as [[decodeStub]]): a perceptual-hash stand-in, a brightness score, and
    * an aspect-preserving thumbnail resize (integer arithmetic only, so the
    * DuckDB oracle states the identical values). The plumbing is the real
    * thing — per-span partition-parallel evaluation of a decode→feature
    * chain; on a cluster with codecs the three expressions become one
    * Arrow-batch UDF over the binary payload column.
    * Output: (subj, media_ref, phash, brightness_e4, thumb_w, thumb_h).
    */
  def features(postings: DataFrame, thumbWidth: Int = 64): DataFrame = {
    val m = Extractors.mediaSpans(postings)
    val d = regexp_extract(col("media_ref"), RefRe, 1).cast("long")
    val i = regexp_extract(col("media_ref"), RefRe, 2).cast("long")
    val meta = decodeStub(col("media_ref"))
    val w = meta.getField("width")
    val h = meta.getField("height")
    // two selects: div() needs the decoded dims as resolved columns — naming
    // them in the same select would hit Spark's lateral-alias rebinding
    m.select(col("doc_id").as("subj"), col("media_ref"),
        ((d * 100003L + i * 17L) % 1000000007L).as("phash"),
        ((d * 7L + i * 13L) % 10000L).as("brightness_e4"),
        w.as("w0"), h.as("h0"))
      .select(col("subj"), col("media_ref"), col("phash"), col("brightness_e4"),
        lit(thumbWidth.toLong).as("thumb_w"),
        expr(s"div($thumbWidth * h0, w0)").as("thumb_h"))
  }

  /** Fake video frame sampling (same stub boundary): treat each media span as
    * a clip whose (deterministic stand-in) frame count is 10 + (d+i) % 20 and
    * emit every `stride`-th frame as its own row — the explode-shaped fan-out
    * a real frame sampler produces, with frame refs a downstream decode/
    * feature stage consumes. At cluster scale the frame count comes from the
    * container header and the per-frame payloads from the codec; the fan-out,
    * schema, and partition-parallel shape stay exactly this.
    * Output: (subj, media_ref, frame_idx, frame_ref).
    */
  def frameSample(postings: DataFrame, stride: Int = 5): DataFrame = {
    val m = Extractors.mediaSpans(postings)
    val d = regexp_extract(col("media_ref"), RefRe, 1).cast("long")
    val i = regexp_extract(col("media_ref"), RefRe, 2).cast("long")
    m.select(col("doc_id").as("subj"), col("media_ref"),
        (lit(10L) + (d + i) % 20L).as("n_frames"))
      .select(col("subj"), col("media_ref"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col("subj"), col("media_ref"), col("frame_idx"),
        concat(col("media_ref"), lit("#f"), col("frame_idx")).as("frame_ref"))
  }
}

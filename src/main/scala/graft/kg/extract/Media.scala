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
}

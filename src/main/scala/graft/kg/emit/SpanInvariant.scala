package graft.kg.emit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-row invariant enforcement (BASELINE.json:15): for every row that
  * survives a stage, the span sequence must be equal on
  * (kind, text, media_ref, order). Stages never rewrite the `spans` array —
  * extractors only *derive* from it — so violations indicate a reordering /
  * rewriting bug; this tap turns that into a cheap distributed check
  * (anti-join on the canonical JSON encoding, no driver collect).
  */
object SpanInvariant {

  private def keyed(postings: DataFrame): DataFrame =
    postings.select(col("doc_id"),
      to_json(col("spans")).as("__spans_json"))

  /** Rows of `after` whose spans differ from (or are absent in) `before`.
    * Empty => invariant holds for all surviving rows.
    */
  def violations(before: DataFrame, after: DataFrame): DataFrame =
    keyed(after).join(keyed(before), Seq("doc_id", "__spans_json"), "left_anti")

  /** Throws if any surviving row violates the invariant. */
  def enforce(before: DataFrame, after: DataFrame): Unit = {
    val bad = violations(before, after).limit(5).collect()
    require(bad.isEmpty,
      s"span-sequence invariant violated for doc_ids: ${bad.map(_.getString(0)).mkString(", ")}")
  }
}

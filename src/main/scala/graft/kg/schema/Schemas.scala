package graft.kg.schema

import org.apache.spark.sql.types._

/** A single document fragment: either a text span (media_ref == "") or an
  * opaque media span (text == ""). `offset` is the strictly-increasing
  * document-order position; the per-row invariant (BASELINE.json:15) is
  * span-sequence equality on (kind, text, media_ref, order).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One interleaved text+media posting document (input_hint, BASELINE.json:15). */
case class PostingDoc(doc_id: String, spans: Seq[Span])

/** A detected gazetteer mention inside one span. */
case class Mention(
    doc_id: String,
    pred: String,
    surface: String,
    entity_id: String,
    offset: Int,
    score: Double)

/** One knowledge-graph edge. `obj` is an entity_id or a normalized literal
  * (e.g. "80-100" for hasWorkload). Partitioned by `pred` on write.
  */
case class Triple(subj: String, pred: String, obj: String, score: Double, src_offset: Int)

/** Gazetteer row (broadcast dimension). */
case class GazEntry(entity_id: String, surface: String, canonical: String)

object Schemas {
  val spanStruct: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  val postings: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanStruct, containsNull = false), nullable = false)))

  val triples: StructType = StructType(Seq(
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("src_offset", IntegerType, nullable = false)))

  object Pred {
    val hasTitle = "hasTitle"
    val requiresSkill = "requiresSkill"
    val hasWorkload = "hasWorkload"
    val requiresLanguage = "requiresLanguage"
    val locatedIn = "locatedIn"
    val postedBy = "postedBy"
    /** R6 depth: obj = "<language entity>=<proficiency qualifier>". */
    val languageProficiency = "languageProficiency"
    val all: Seq[String] =
      Seq(hasTitle, requiresSkill, hasWorkload, requiresLanguage, locatedIn, postedBy)
  }
}

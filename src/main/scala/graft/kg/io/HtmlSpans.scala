package graft.kg.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R1 upstream — the HTML→spans corpus-prep on-ramp (SURVEY.md §2.1 R1:
  * "HTML→spans flattening happens upstream"). The reference fetches a URL
  * and walks the jsoup DOM one document at a time; a user coming from it
  * holds raw HTML strings, while this pipeline's binding input is the
  * `postings(doc_id, spans)` table. [[flatten]] closes that gap: a
  * deliberately TAG-SOUP-grade flattener (regex over block elements —
  * clearly not a DOM parser, and documented as such) that emits the
  * binding span schema `array<struct<kind,text,media_ref,offset>>` with
  * document order preserved, as one Catalyst projection per document —
  * `regexp_extract_all` keeps match order, so span order IS document
  * order, and the whole prep scales with the scan (no UDF, no RDD,
  * whole-stage codegen).
  *
  * Supported markup (the block kinds the extractors consume): paired
  * `<title|h1|h2|li|p|footer>` elements (attributes tolerated, entities
  * `&amp; &lt; &gt;` unescaped, inner markup NOT recursed — tag-soup
  * grade) and void `<img src="…">` elements, which become `media` spans
  * carrying the src as `media_ref` (the interleaved-payload shape: media
  * participates in the order invariant, text extractors skip it).
  *
  * [[render]] is the exact inverse on well-formed span tables (escaping
  * mirrors unescaping), which gives the operator its strongest test: for
  * ANY postings table, `flatten(render(postings))` must reproduce the
  * span sequence byte-exactly — the BASELINE.json:15 invariant driven
  * through the on-ramp (SpanInvariantSpec). The oracle-paired
  * `kg_html_spans` query drives [[flatten]] over [[htmlCorpus]], a
  * deterministic HTML rendering of the harness documents, against a
  * closed-form DuckDB statement of the expected spans.
  */
object HtmlSpans {

  /** One regex alternation over the supported block elements; group order:
    * (kind, attrs, text | imgSrc). Matches are extracted with group 0 and
    * re-dissected per fragment, so only ORDER comes from this pattern.
    */
  private[graft] val FragmentRe =
    "(?s)<(title|h1|h2|li|p|footer)(\\s[^>]*)?>(.*?)</\\1>|" +
      "<img\\s[^>]*?src=\"([^\"]*)\"[^>]*?>"

  /** Entity escaping for rendered text ('&' first — the classic order that
    * makes [[unescape]] ('&' last) its exact inverse).
    */
  private def escape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def unescape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&lt;", "<"), "&gt;", ">"), "&amp;", "&")

  /** `(doc_id, html)` → `(doc_id, spans)` in the binding span schema.
    * Order: spans are numbered by match position (offset 0..n-1 over the
    * document). Unmatched markup between fragments is ignored (tag-soup:
    * wrappers like `<div>`/`<ul>` around the block elements fall away).
    */
  def flatten(html: DataFrame): DataFrame = {
    val frags = regexp_extract_all(col("html"), lit(FragmentRe), lit(0))
    html.select(col("doc_id"), transform(frags, (f, i) => {
      val isMedia = f.startsWith("<img")
      struct(
        when(isMedia, lit("media"))
          .otherwise(regexp_extract(f, "^<([a-z0-9]+)", 1)).as("kind"),
        when(isMedia, lit(""))
          .otherwise(unescape(
            regexp_extract(f, "(?s)^<[^>]*>(.*)</[a-z0-9]+>$", 1))).as("text"),
        when(isMedia,
          regexp_replace(regexp_replace(
            regexp_extract(f, "src=\"([^\"]*)\"", 1),
            "&quot;", "\""), "&amp;", "&")).otherwise(lit("")).as("media_ref"),
        i.cast("int").as("offset"))
    }).as("spans"))
  }

  /** `(doc_id, spans)` → `(doc_id, html)` — the inverse serialization:
    * one block element per span in span order, text entity-escaped, media
    * spans as `<img src="…">`. Exists for the round-trip identity test and
    * as the export sink shape (a spans table rendered back to markup).
    */
  def render(postings: DataFrame): DataFrame =
    postings.select(col("doc_id"), expr(
      """array_join(transform(spans, sp ->
        |  CASE WHEN sp.kind = 'media'
        |    THEN concat('<img src="',
        |      replace(replace(sp.media_ref, '&', '&amp;'), '"', '&quot;'), '">')
        |    ELSE concat('<', sp.kind, '>',
        |      replace(replace(replace(sp.text,
        |        '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
        |      '</', sp.kind, '>') END), chr(10))""".stripMargin).as("html"))

  /** Deterministic synthetic HTML corpus over the harness `documents`
    * table (doc_id, text, source): title element, 8-token body chunks as
    * `<p>`/`<li>` (i%4==1 → li), an `<img>` after chunk i whenever
    * (doc_id+i)%3==0 (interleaved media), and a source footer — every
    * span a closed-form function of (doc_id, text, source), which is what
    * the DuckDB oracle of `kg_html_spans` states directly (the pairing
    * proves [[flatten]] inverts this rendering on the whole corpus).
    */
  def htmlCorpus(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val tokens = split(col("text"), " ")
    val nb = ((size(tokens) + 7) / 8).cast("int")
    val title = concat(lit("<title>posting "), d.cast("string"), lit("</title>"))
    val chunkFrags = transform(sequence(lit(0), nb - 1), i => {
      val kind = when(i % 4 === 1, lit("li")).otherwise(lit("p"))
      val body = escape(array_join(slice(tokens, i * 8 + 1, lit(8)), " "))
      val tagged = concat(lit("<"), kind, lit(">"), body, lit("</"), kind, lit(">"))
      val img = when((d + i) % 3 === 0,
        concat(lit("\n<img src=\"img://"), d.cast("string"), lit("/"),
          i.cast("string"), lit("\">"))).otherwise(lit(""))
      concat(tagged, img)
    })
    val footer = concat(lit("<footer>src "), escape(col("source")), lit("</footer>"))
    // doc_id string-cast in a SECOND select: aliasing the cast alongside
    // expressions that reference col("doc_id") would rebind them laterally
    // (the SyntheticCorpus.fromDocuments gotcha)
    docs
      .select(d, concat_ws("\n", title,
        array_join(chunkFrags, "\n"), footer).as("html"))
      .select(col("doc_id").cast("string").as("doc_id"), col("html"))
  }
}

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
  * Supported markup (the block kinds the extractors consume):
  *  - paired `<title|h1|h2|footer>` elements (attributes tolerated,
  *    entities `&amp; &lt; &gt;` unescaped);
  *  - `<li>` / `<p>` elements, CLOSED OR NOT: content terminates at the
  *    matching close tag or at the next block/container tag boundary
  *    (`<li>a<li>b` and `<ul><li>a</ul>` both yield the spans a real
  *    parser would — the crawled-HTML pattern where `</li>`/`</p>` is
  *    routinely omitted);
  *  - INLINE child markup inside any block is unwrapped to its text:
  *    `<b>/<i>/<em>/<strong>/<a>/<span>/<u>/<s>/<code>/<small>/<sup>/
  *    <sub>/<mark>/<abbr>/<br>/<wbr>` tags are stripped
  *    (`<li>Java <b>required</b></li>` → `Java required`), so real
  *    emphasis/link markup no longer pollutes extractor input;
  *  - void `<img src="…">` elements BETWEEN blocks become `media` spans
  *    carrying the src as `media_ref` (the interleaved-payload shape:
  *    media participates in the order invariant, text extractors skip
  *    it). An `<img>` nested INSIDE a block is stripped from the text
  *    (its src is dropped — the flat span model cannot nest media inside
  *    a text span).
  *
  * Still tag-soup grade, not a DOM: nesting is flattened (a nested block
  * closes its parent — text AFTER a nested child inside the same parent
  * is dropped), unknown container tags fall away, and tags are matched
  * lowercase.
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

  /** Tags that TERMINATE an unclosed `<li>`/`<p>`: the emitted block kinds
    * plus the common container elements a crawled page wraps them in. An
    * open or close of any of these ends the dangling block's content (the
    * next-open-tag termination real parsers apply to li/p).
    */
  private val Boundary =
    "title|h[1-6]|li|p|footer|ul|ol|div|section|article|header|nav|aside|" +
      "table|thead|tbody|tr|td|th|blockquote|pre|form|body|html"

  /** One regex alternation over the supported block elements. Matches are
    * extracted with group 0 and re-dissected per fragment, so only ORDER
    * comes from this pattern. li/p content is a tempered dot — any run not
    * opening/closing a [[Boundary]] tag — followed by an OPTIONAL matching
    * close, which is what makes unclosed `<li>`/`<p>` terminate at the
    * next block instead of swallowing it (or falling away entirely).
    */
  private[graft] val FragmentRe =
    "(?s)<(title|h1|h2|footer)(\\s[^>]*)?>(.*?)</\\1\\s*>|" +
      s"<(li|p)(\\s[^>]*)?>((?:(?!</?(?:$Boundary)[\\s>/]).)*)(?:</\\4\\s*>)?|" +
      "<img\\s[^>]*?src=\"([^\"]*)\"[^>]*?>"

  /** Inline child tags unwrapped to their text inside block content (open,
    * close, or self-closing, attributes tolerated). Includes `img` so a
    * media element nested inside a block degrades to "dropped from text"
    * rather than leaking literal markup into extractor input.
    */
  private val InlineRe =
    "(?is)</?(?:b|i|em|strong|a|span|u|s|code|small|sup|sub|mark|abbr|" +
      "br|wbr|img)(?:\\s[^>]*)?\\s*/?>"

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
      // inner text: open tag to the (now OPTIONAL — unclosed li/p) block
      // close; inline child tags stripped BEFORE entity unescaping, so
      // escaped literals like &lt;b&gt; in user text survive as text and
      // the render round-trip stays the identity
      // \z, not $: $ would match before a final newline and silently drop
      // it from unclosed-block content (which legitimately ends in the
      // separator whitespace preceding the terminating tag)
      val rawText = regexp_extract(f,
        "(?s)^<[^>]*>(.*?)(?:</(?:title|h1|h2|li|p|footer)\\s*>)?\\z", 1)
      struct(
        when(isMedia, lit("media"))
          .otherwise(regexp_extract(f, "^<([a-z0-9]+)", 1)).as("kind"),
        when(isMedia, lit(""))
          .otherwise(unescape(
            regexp_replace(rawText, InlineRe, ""))).as("text"),
        when(isMedia,
          regexp_replace(regexp_replace(
            regexp_extract(f, "src=\"([^\"]*)\"", 1),
            "&quot;", "\""), "&amp;", "&")).otherwise(lit("")).as("media_ref"),
        i.cast("int").as("offset"))
    }).as("spans"))
  }

  /** NESTED-markup flattener — one honesty grade up from [[flatten]]
    * toward DOM semantics, still ONE Catalyst projection per document (no
    * UDF, no RDD, no shuffle; the prep scales with the scan). Where
    * [[flatten]] matches whole block elements with a regex alternation
    * (nested blocks close their parent; text after a nested child is
    * DROPPED), this parser tokenizes the document into a tag/text EVENT
    * STREAM (`regexp_extract_all` keeps order) and folds it through a
    * `aggregate` higher-order function carrying an explicit ELEMENT STACK
    * — the jsoup-walk recast as a per-row catalyst fold:
    *
    *  - every maximal text run becomes a span labeled with the kind of
    *    its NEAREST enclosing emitted block (`title|h1|h2|li|p|footer`);
    *    text directly under non-emitted containers (`div`, `td`, `body`,
    *    …) degrades to kind `p` instead of being dropped —
    *    `<li>a<p>b</p>c</li>` yields li:a, p:b, li:c (the tail survives),
    *    `<div>lead<p>x</p>tail</div>` yields p:lead, p:x, p:tail;
    *  - HTML5 auto-close rules: an open block auto-closes a top `<p>`; a
    *    new `<li>` additionally auto-closes a top `<li>` (nested lists
    *    keep the outer li open — `<li>a<ul><li>b</li></ul>c</li>` keeps
    *    c on the OUTER li); a close tag pops through unclosed children;
    *    stray closes are ignored;
    *  - inline tags (the [[flatten]] set) and unknown tags are
    *    TRANSPARENT (unwrapped to their text); `<script>`/`<style>`
    *    bodies, comments, and markup declarations / processing
    *    instructions (`<!DOCTYPE …>`, `<?xml …?>`) are stripped before
    *    tokenizing; a `<` that opens no tag is text;
    *  - `<img src>` ANYWHERE emits a `media` span at its document
    *    position — inside a block it SPLITS the text span (richer than
    *    [[flatten]], which drops nested media), preserving the
    *    interleaved payload order invariant;
    *  - an explicitly-closed empty block (`<p></p>`) is preserved as an
    *    empty span (what makes the [[render]] round-trip an identity);
    *    whitespace-only runs BETWEEN blocks (separator newlines) drop.
    *
    * `flattenNested(render(postings)) = postings.spans` holds for every
    * well-formed span table (SpanInvariantSpec proves it corpus-wide), and
    * on [[htmlCorpus]] the output is row-identical to [[flatten]]'s —
    * `kg_html_spans_nested` shares `kg_html_spans`' closed-form oracle
    * (two result-equal plans, one oracle: the gazetteer-trie pairing).
    *
    * Cost model: the fold is per-document and event-linear with a string
    * accumulator (records joined by US/RS control separators — chr 30/31
    * are reserved and stripped from emitted text, the one departure from
    * byte-identity, for pathological inputs only); measured ~3.5× the
    * struct-array accumulator it replaced. Higher-order functions
    * evaluate interpreted (no whole-stage codegen), so this is the
    * ROBUSTNESS path; [[flatten]] remains the throughput path — both are
    * verified against the same oracle.
    */
  def flattenNested(html: DataFrame): DataFrame = {
    val Emit = "('title','h1','h2','footer','li','p')"
    val Block = "('title','h1','h2','h3','h4','h5','h6','li','p','footer'," +
      "'ul','ol','div','section','article','header','nav','aside','table'," +
      "'thead','tbody','tr','td','th','blockquote','pre','form','body','html')"
    def unesc(x: String) =
      s"replace(replace(replace($x, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"
    def kindOf(stk: String) =
      s"coalesce(try_element_at(filter($stk, k -> k IN $Emit), -1), 'p')"
    // flush the text buffer as one record: kind US text US (media_ref '');
    // `always` preserves a genuinely empty immediately-closed block, else
    // whitespace-only buffers (inter-tag separators) drop. chr(30)/chr(31)
    // are the record/field separators and are stripped from text.
    def flushed(stk: String, buf: String, out: String, always: String) =
      s"IF(($always) OR $buf RLIKE '\\\\S', " +
        s"concat($out, chr(30), ${kindOf(stk)}, chr(31), " +
        s"translate(${unesc(buf)}, chr(30) || chr(31), ''), chr(31)), $out)"
    // '' for text runs; tag name lowercased for tag events. The fold reads
    // these from the PRE-TOKENIZED event struct (`e.tag` etc.): the step
    // expression references the tag in up to six places per event, and in
    // the interpreted fold each reference would re-run its regexp — the
    // same per-element re-evaluation pathology as the split() hoists.
    val tag = "e.tag"
    // open-branch auto-close: any block open pops a top <p>; a new <li>
    // additionally pops a top <li>
    val s1 = "IF(try_element_at(acc.stk, -1) = 'p', " +
      "slice(acc.stk, 1, size(acc.stk) - 1), acc.stk)"
    val s2 = s"IF($tag = 'li' AND try_element_at($s1, -1) = 'li', " +
      s"slice($s1, 1, size($s1) - 1), $s1)"
    // close-branch: pop through the LAST occurrence of the closed tag
    // (tolerates unclosed children); absent tag = stray close, no pop
    val pos = s"coalesce(array_position(reverse(acc.stk), $tag), 0)"
    // non-close flushes (block open / media / end of document) also
    // always-emit when a NON-EMPTY buffer sits directly inside a freshly
    // opened emitted block: a whitespace-only unclosed <li>/<p> is a real
    // span (what [[flatten]]'s tempered-dot match emits too), while
    // separator whitespace under containers (`<ul>\n<li>`) still drops
    val openAlw = s"acc.fresh AND acc.buf <> '' AND " +
      s"try_element_at(acc.stk, -1) IN $Emit"
    // comments first (so '-->' can't hide a declaration close), then
    // script/style bodies, then markup declarations / processing
    // instructions (<!DOCTYPE …>, <![CDATA[…, <?xml …?>) — the tokenizer
    // would otherwise read '<' + '!DOCTYPE html>' as TEXT and flush it as
    // a spurious leading p span on virtually every real crawled page
    val pre = "regexp_replace(regexp_replace(regexp_replace(html, " +
      "'(?s)<!--.*?-->', ''), " +
      "'(?is)<(script|style)(\\\\s[^>]*)?>.*?</\\\\1\\\\s*>', ''), " +
      "'(?s)<[!?][^>]*>', '')"
    val zero = "named_struct('stk', cast(array() AS array<string>), " +
      "'buf', '', 'fresh', false, 'out', '')"
    val step = s"""CASE
      WHEN e.txt IS NOT NULL THEN
        named_struct('stk', acc.stk, 'buf', acc.buf || e.txt,
          'fresh', acc.fresh, 'out', acc.out)
      WHEN $tag = 'img' AND NOT e.close THEN
        IF(e.hassrc,
          named_struct('stk', acc.stk, 'buf', '', 'fresh', false,
            'out', concat(${flushed("acc.stk", "acc.buf", "acc.out", openAlw)},
              chr(30), 'media', chr(31), chr(31), e.src)),
          acc)
      WHEN NOT $tag IN $Block THEN acc
      WHEN e.close THEN IF($pos = 0, acc, named_struct(
        'stk', slice(acc.stk, 1, size(acc.stk) - cast($pos AS INT)),
        'buf', '', 'fresh', false,
        'out', ${flushed("acc.stk", "acc.buf", "acc.out",
          s"acc.fresh AND try_element_at(acc.stk, -1) = $tag AND $tag IN $Emit")}))
      ELSE named_struct(
        'stk', $s2 || array($tag),
        'buf', '', 'fresh', true,
        'out', ${flushed("acc.stk", "acc.buf", "acc.out", openAlw)})
      END"""
    // records are kind-first and separator-framed, so never '': the filter
    // drops exactly the artificial head the leading chr(30) creates
    val finAlw = "a.fresh AND a.buf <> '' AND " +
      s"try_element_at(a.stk, -1) IN $Emit"
    val finish = s"a -> transform(filter(split(" +
      s"${flushed("a.stk", "a.buf", "a.out", finAlw)}, chr(30)), " +
      "rec0 -> rec0 <> ''), (rec, i) -> named_struct(" +
      "'kind', element_at(split(rec, chr(31)), 1), " +
      "'text', element_at(split(rec, chr(31)), 2), " +
      "'media_ref', element_at(split(rec, chr(31)), 3), " +
      "'offset', cast(i AS INT)))"
    // PRE-TOKENIZED event stream: each raw event is classified ONCE into
    // (txt, tag, close, hassrc, src) before the fold — the step expression
    // reads plain struct fields instead of re-running its tag/src regexes
    // at every one of its (up to six) references per event in the
    // interpreted fold. Two transform passes: the second derives the
    // img-src fields from the first's tag/close so the src regex runs only
    // on img-open events.
    val tok = s"transform(transform(regexp_extract_all($pre, " +
      "'(?s)</?[a-zA-Z][^>]*>|[^<]+|<', 0), r -> named_struct(" +
      "'r', r, " +
      "'txt', IF(r RLIKE '^</?[a-zA-Z]', CAST(NULL AS STRING), r), " +
      "'tag', lower(regexp_extract(r, '^</?([a-zA-Z][a-zA-Z0-9]*)', 1)), " +
      "'close', r LIKE '</%')), " +
      "v -> named_struct('txt', v.txt, 'tag', v.tag, 'close', v.close, " +
      "'hassrc', v.tag = 'img' AND NOT v.close AND v.r RLIKE 'src=\"', " +
      "'src', IF(v.tag = 'img' AND NOT v.close AND v.r RLIKE 'src=\"', " +
      "translate(replace(replace(regexp_extract(v.r, 'src=\"([^\"]*)\"', 1), " +
      "'&quot;', '\"'), '&amp;', '&'), chr(30) || chr(31), ''), '')))"
    val sql = s"aggregate($tok, $zero, (acc, e) -> $step, $finish)"
    html.select(col("doc_id"), expr(sql).as("spans"))
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
    *
    * Two crawled-HTML irregularities are woven in deterministically so the
    * corpus-wide oracle also proves the hardened grammar:
    *  - chunks with i%3==1 wrap their FIRST token in `<b>…</b>` — the
    *    flattener must unwrap the inline markup to the same text the
    *    plain rendering would carry;
    *  - `<li>` chunks with i%8==5 (and no trailing img) OMIT `</li>` —
    *    next-open-tag termination; their text picks up the separator
    *    newline that precedes the next tag (stated identically in the
    *    oracle).
    */
  def htmlCorpus(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    // tokens projected first (extra select below): the chunk lambda slices
    // them three times per chunk, and an inline split() would re-evaluate
    // per slice in the interpreted HOF — O(tokens²) per doc
    val tokens = col("ts")
    val nb = ((size(tokens) + 7) / 8).cast("int")
    val title = concat(lit("<title>posting "), d.cast("string"), lit("</title>"))
    val chunkFrags = transform(sequence(lit(0), nb - 1), i => {
      val kind = when(i % 4 === 1, lit("li")).otherwise(lit("p"))
      val first = escape(array_join(slice(tokens, i * 8 + 1, lit(1)), " "))
      val rest = escape(array_join(slice(tokens, i * 8 + 2, lit(7)), " "))
      val plain = escape(array_join(slice(tokens, i * 8 + 1, lit(8)), " "))
      val body = when(i % 3 === 1,
        concat(lit("<b>"), first, lit("</b>"),
          when(length(rest) > 0, concat(lit(" "), rest)).otherwise(lit(""))))
        .otherwise(plain)
      val unclosedLi = (i % 4 === 1) && (i % 8 === 5) && ((d + i) % 3 =!= 0)
      val close = when(unclosedLi, lit(""))
        .otherwise(concat(lit("</"), kind, lit(">")))
      val tagged = concat(lit("<"), kind, lit(">"), body, close)
      val img = when((d + i) % 3 === 0,
        concat(lit("\n<img src=\"img://"), d.cast("string"), lit("/"),
          i.cast("string"), lit("\">"))).otherwise(lit(""))
      concat(tagged, img)
    })
    val footer = concat(lit("<footer>src "), escape(col("source")), lit("</footer>"))
    // doc_id string-cast in a SECOND select: aliasing the cast alongside
    // expressions that reference col("doc_id") would rebind them laterally
    // (the SyntheticCorpus.fromDocuments gotcha)
    // NO spreadSmall here (deliberate, A/B-measured): both flatteners are
    // driver-bound at harness scale (plan analysis of the giant fold
    // expression), so spreading the 1–3 scan tasks did not move wall and
    // only added an exchange — see OPTIMIZATION_r07.md C10.
    docs
      .select(d, col("source"), split(col("text"), " ").as("ts"))
      .select(d, concat_ws("\n", title,
        array_join(chunkFrags, "\n"), footer).as("html"))
      .select(col("doc_id").cast("string").as("doc_id"), col("html"))
  }
}

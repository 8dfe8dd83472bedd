package graft

import graft.ext.KeywordTags

/** Aho–Corasick tagger: automaton counts == naive every-occurrence
  * counts (including overlap-heavy adversarial strings), the shipped
  * dictionary is border-free (the oracle-equivalence precondition),
  * and the Spark kernel's per-keyword rollup matches a driver-side
  * recount of the same frame. */
class KeywordTagsSpec extends SparkSpec {
  import spark.implicits._

  test("automaton matches naive counts on adversarial strings") {
    val kws = Vector("ab", "abc", "bc", "c", "table scan", "spark")
    val ac = new KeywordTags.Automaton(kws)
    val texts = Seq(
      "abcabcabc", "aaabbbccc", "table scan table scan", "sparkspark",
      "ab" * 50 + "c", "the table scans spark abc bc c", "")
    texts.foreach { t =>
      val acc = new Array[Long](kws.length)
      ac.countInto(t, acc)
      kws.zipWithIndex.foreach { case (kw, i) =>
        assert(acc(i) === KeywordTags.naiveCount(t, kw),
          s"kw=$kw text=$t")
      }
    }
  }

  test("shipped dictionary is border-free; a bordered word is caught") {
    KeywordTags.Keywords.foreach(k =>
      assert(!KeywordTags.hasBorder(k), s"bordered keyword: $k"))
    assert(KeywordTags.hasBorder("batch batch"))
    assert(KeywordTags.hasBorder("aa"))
  }

  test("kernel rollup matches driver-side recount") {
    val docs = Seq(
      (1L, "spark table scan spark"),
      (2L, "sort merge and table scan"),
      (3L, "nothing here"),
      (4L, "customer customer spark")).toDF("doc_id", "text")
    val got = KeywordTags.tagCounts(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = KeywordTags.Keywords.flatMap { kw =>
      val per = Seq(
        "spark table scan spark", "sort merge and table scan",
        "nothing here", "customer customer spark")
        .map(KeywordTags.naiveCount(_, kw))
      val hits = per.sum
      if (hits > 0) Some((kw, per.count(_ > 0).toLong, hits)) else None
    }.toSet
    assert(got === want)
  }
}

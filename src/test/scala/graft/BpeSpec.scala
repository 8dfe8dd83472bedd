package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE learn + apply: the Sennrich loop's determinism and the
  * Column-fold application's parity with a driver-side re-application
  * of the same merge table. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The classic Sennrich corpus: word frequencies low×5, lower×2,
    * newest×6, widest×3, flattened to documents. */
  private def sennrichDocs = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" ")))
    .toDF("doc_id", "text")

  /** Driver-side reference: seed chars + </w>, fold the merge table
    * with the same left-to-right non-overlapping semantics. */
  private def refCount(w: String, merges: Seq[(String, String)]): Long = {
    var syms = w.map(_.toString).toVector :+ "</w>"
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length.toLong
  }

  test("learnMerges: first merges follow frequency order, deterministically") {
    val m = Bpe.learnMerges(sennrichDocs, numMerges = 8)
    // newest×6 dominates: (e,s) count 6+3=9 wins first (tie-broken
    // against nothing — it is the unique max: s,t = 9 too? s+t: 6+3=9;
    // e,s: 9. Tie → lexicographic (a,b): ("e","s") < ("s","t")).
    assert(m.head == ("e", "s"))
    assert(m.length == 8)
    // re-learning is bit-identical (pure function of the corpus)
    assert(Bpe.learnMerges(sennrichDocs, numMerges = 8) == m)
  }

  test("tokenizeCol/countCol match a driver-side fold for every corpus word") {
    val m = Bpe.learnMerges(sennrichDocs)
    val words = Seq("low", "lower", "newest", "widest", "lowest", "wide")
    val got = words.toDF("w")
      .select(col("w"), Bpe.wordBpeCol(col("w"), m).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) == refCount(w, m), s"word '$w'")
    }
    // fully-merged frequent words collapse to one symbol
    assert(got("newest") == 1L)
    assert(got("low") == 1L)
  }

  test("docBpeCol sums word counts; empty/whitespace text counts 0") {
    val m = Bpe.learnMerges(sennrichDocs)
    val docs = Seq((1L, "low lower low"), (2L, ""), (3L, "  "),
      (4L, "newest widest")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Bpe.docBpeCol(col("text"), m))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == refCount("low", m) * 2 + refCount("lower", m))
    assert(got(2L) == 0L)
    assert(got(3L) == 0L)
    assert(got(4L) == refCount("newest", m) + refCount("widest", m))
  }

  test("BpeTokenizer: token-for-token equal to the replace chain, corpus-wide") {
    // the kernel's contract: EXACT bracketed-string equality with the
    // Column fold for every distinct word in the real corpus (plus
    // adversarial shapes the synthetic corpus lacks). ASCII contract
    // as documented on the learn loop.
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val m = Bpe.mergesMemo(docs, sf001)
    val tok = new graft.ext.BpeTokenizer(m)
    val words = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct()
    val chain = words
      .select(col("w"), Bpe.tokenizeCol(col("w"), m).as("tok"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(chain.nonEmpty)
    chain.foreach { case (w, expected) =>
      assert(tok.tokenizeBracketed(w) == expected, s"word '$w'")
    }
    // shapes outside the corpus: unseen chars, repeats, 1-char words,
    // and a supplementary-plane char (seeding must be per CODE POINT
    // like the chain's `(.)` — charAt would split the surrogate pair)
    Seq("low", "lower", "zzz", "ababab", "x", "lowlow",
      "lo😀w").foreach { w =>
      val expected = Seq(w).toDF("w")
        .select(Bpe.tokenizeCol(col("w"), m)).head().getString(0)
      assert(tok.tokenizeBracketed(w) == expected, s"word '$w'")
    }
  }

  test("docBpeCounts kernel == docBpeCol per document over the corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val m = Bpe.mergesMemo(docs, sf001)
    val colSide = docs.where(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        Bpe.docBpeCol(col("text"), m).as("n_bpe"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernelSide = Bpe.docBpeCounts(docs, m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernelSide.nonEmpty)
    assert(kernelSide == colSide)
  }

  test("BpeTokenizer == chain under a deep merge table (randomized words)") {
    // the kernel exists for big merge tables; exercise rank chains far
    // deeper than the corpus's 24 (re-enabled-pair edge cases scale
    // with table depth). Deterministic seed — reproducible.
    val rnd = new scala.util.Random(42)
    val words = (1 to 300).map(_ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString)
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, numMerges = 100, vocabCap = 500)
    assert(m.length >= 50, s"expected a deep table, got ${m.length}")
    val tok = new graft.ext.BpeTokenizer(m)
    words.distinct.toDF("w")
      .select(col("w"), Bpe.tokenizeCol(col("w"), m).as("t"))
      .collect().foreach { r =>
        assert(tok.tokenizeBracketed(r.getString(0)) == r.getString(1),
          s"word '${r.getString(0)}'")
      }
  }

  test("merge count caps at available pairs without diverging") {
    // single 2-char word: seed [a][b][</w>] has 2 pairs; asking for
    // 10 merges must stop after exhausting them, not loop or throw
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, numMerges = 10)
    assert(m.length <= 3)
    val n = docs.select(Bpe.docBpeCol(col("text"), m)).head().getLong(0)
    assert(n == 1L) // fully merged to [ab</w>]
  }

  test("byte-level BPE: UTF-8 multi-byte seeding, lossless hex " +
    "reassembly, and ASCII parity with the char alphabet") {
    // 'café' is 4 code points but 5 UTF-8 bytes — the byte seed must
    // split the two-byte é (C3 A9), which the char path never sees
    val docs = Seq((1L, "café café aa")).toDF("doc_id", "text")
    val seed = docs
      .select(Bpe.seedBytesCol(lit("café")).as("s")).head().getString(0)
    assert(seed === "[63][61][66][C3][A9][</w>]")
    // with zero merges the byte token count IS the byte count + 1
    assert(docs.select(Bpe.docBpeBytesCol(col("text"), Nil))
      .head().getLong(0) === (5 + 1) * 2L + (2 + 1))
    // learned merges reassemble losslessly: stripping brackets from
    // the folded string gives back exactly the seed's hex stream
    val m = Bpe.learnMergesBytes(docs, numMerges = 6)
    assert(m.nonEmpty)
    val folded = docs.select(
      Bpe.foldMerges(Bpe.seedBytesCol(lit("café")), m).as("t"))
      .head().getString(0)
    assert(folded.filterNot(c => c == '[' || c == ']')
      === "636166C3A9</w>")
    // on a pure-ASCII corpus byte and char fertility totals agree
    // (the alphabets are isomorphic there)
    val ascii = sennrichDocs
    val mc = Bpe.learnMerges(ascii)
    val mb = Bpe.learnMergesBytes(ascii)
    val nc = ascii.select(sum(Bpe.docBpeCol(col("text"), mc)))
      .head().getLong(0)
    val nb = ascii.select(sum(Bpe.docBpeBytesCol(col("text"), mb)))
      .head().getLong(0)
    assert(nc === nb,
      s"ASCII corpus: char tokens $nc must equal byte tokens $nb")
  }
}

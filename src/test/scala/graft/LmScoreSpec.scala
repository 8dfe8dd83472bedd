package graft

import graft.ext.LmScore

/** The scaled-integer log decomposition behind q_lm_score: exactness
  * of the constants and accuracy of the mantissa/exponent approximation
  * across the probability range. */
class LmScoreSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** The integer pipeline, driver-side (mirrors the Column/SQL expr). */
  private def nl2(pfx0: Long): Long = {
    val pfx = math.max(pfx0, 1L)
    val e = 64 - java.lang.Long.numberOfLeadingZeros(pfx) // bit length
    val m = (pfx * LmScore.MScale) / (1L << (e - 1))
    LmScore.L9Fx - (e - 1).toLong * LmScore.LogScale -
      LmScore.Log2Table((m - LmScore.MScale).toInt)
  }

  test("table is monotone nondecreasing over the mantissa range") {
    assert(LmScore.Log2Table.length == LmScore.MScale)
    assert(LmScore.Log2Table.head == 0L)
    LmScore.Log2Table.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b)
      case _ =>
    }
    // last entry just under one octave: 2^20 * log2((2M-1)/M)
    assert(LmScore.Log2Table.last > (LmScore.LogScale * 99) / 100)
    assert(LmScore.Log2Table.last < LmScore.LogScale)
  }

  test("decomposition tracks -log2(p) within 2^-8 across the range") {
    // pfx = p * 1e9 for p spanning 1e-8 .. 1
    val pfxs = Seq(10L, 137L, 999L, 12345L, 777777L, 5000001L,
      99999999L, 499999999L, 1000000000L)
    pfxs.foreach { pfx =>
      val p = pfx.toDouble / LmScore.PScale
      val want = -StrictMath.log(p) / StrictMath.log(2.0)
      val got = nl2(pfx).toDouble / LmScore.LogScale
      assert(math.abs(got - want) < 1.0 / 256.0 + 1e-6,
        s"pfx=$pfx got=$got want=$want")
    }
  }

  test("positive-integer log2fx tracks log2(n) within 2^-8") {
    // the q_pmi_bigrams / q_token_entropy variant: log2 of a count,
    // no probability division in front
    def lg(n: Long): Long = {
      val e = 64 - java.lang.Long.numberOfLeadingZeros(n)
      val m = (n * LmScore.MScale) >> (e - 1)
      (e - 1).toLong * LmScore.LogScale +
        LmScore.Log2Table((m - LmScore.MScale).toInt)
    }
    Seq(1L, 2L, 3L, 7L, 100L, 512L, 513L, 999983L, (1L << 40) + 17)
      .foreach { n =>
        val want = StrictMath.log(n.toDouble) / StrictMath.log(2.0)
        val got = lg(n).toDouble / LmScore.LogScale
        assert(got <= want + 1e-9 && got > want - 1.0 / 256.0,
          s"n=$n got=$got want=$want")
      }
    assert(lg(1L) == 0L)
  }

  test("bit-length via binary-string length matches the intrinsic") {
    // the engines compute e as length(conv/bin(pfx)) — same integer
    Seq(1L, 2L, 3L, 127L, 128L, 1000000000L).foreach { x =>
      assert(java.lang.Long.toBinaryString(x).length ==
        64 - java.lang.Long.numberOfLeadingZeros(x))
    }
  }

  test("p = 1 scores ~0 bits and smaller p scores strictly more") {
    assert(nl2(LmScore.PScale).toDouble / LmScore.LogScale < 0.01)
    assert(nl2(1000L) > nl2(1000000L))
    assert(nl2(1000000L) > nl2(999999999L))
  }
}

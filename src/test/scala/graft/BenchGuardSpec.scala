package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The shared-build transient guard's baseline derivation (ADVICE
  * r14: the original regex matched NOTHING in the committed records —
  * the driver stores the printed line escaped inside a truncated
  * `tail` field — so the guard was dead code; r14 verdict #3: the
  * fire path had never been validated). Pure-file tests, no session.
  */
class BenchGuardSpec extends AnyFunSuite {

  private def tmpDir(): java.nio.file.Path =
    Files.createTempDirectory("graft-benchguard")

  test("escaped, head-truncated driver records parse via the " +
    "shared_components sum") {
    val d = tmpDir()
    // the committed shape: tail is an escaped string whose head
    // (including _shared_build) is truncated away; shared_components
    // survives near the end of the line
    Files.writeString(d.resolve("BENCH_r07.json"),
      """{"n":7,"rc":0,"tail":"\":0.461,\"q_x\":0.5,""" +
        """\"shared_components\":{\"sim\":19.9,\"minhash\":5.1,""" +
        """\"media\":0.0},\"sf\":\"/x\",\"cold_total\":307.5}\n"}""")
    val got = Bench.sharedBaseline(d)
    assert(got.isDefined, "must parse the escaped record")
    assert(math.abs(got.get._1 - 25.0) < 1e-9, got)
    assert(got.get._2.contains("BENCH_r*.json"))
  }

  test("unescaped _shared_build still matches (older/raw records)") {
    val d = tmpDir()
    Files.writeString(d.resolve("BENCH_r03.json"),
      """{"queries":{"_shared_build":42.5,"q_a":1.0}}""")
    val got = Bench.sharedBaseline(d)
    assert(got.isDefined && math.abs(got.get._1 - 42.5) < 1e-9, got)
  }

  test("history file takes precedence over records and yields the " +
    "median of the last 5") {
    val d = tmpDir()
    Files.writeString(d.resolve("BENCH_r01.json"),
      """{"queries":{"_shared_build":999.0}}""")
    Files.writeString(d.resolve("BENCH_SHARED_HISTORY.jsonl"),
      (1 to 7).map(i =>
        s"""{"shared_build_sec":$i.000,"rerun":false,"sf":"/x"}""")
        .mkString("", "\n", "\n"))
    val got = Bench.sharedBaseline(d)
    // last 5 of 1..7 = 3..7, median = 5
    assert(got.isDefined && math.abs(got.get._1 - 5.0) < 1e-9, got)
    assert(got.get._2.contains("history"))
  }

  test("history lines from a DIFFERENT sf dir are excluded from the " +
    "median (ADVICE r15: one sf0.001 run would skew the guard)") {
    val d = tmpDir()
    Files.writeString(d.resolve("BENCH_SHARED_HISTORY.jsonl"),
      """{"shared_build_sec":50.0,"rerun":false,"sf":"/t/sf0.1"}""" + "\n" +
        """{"shared_build_sec":1.0,"rerun":false,"sf":"/t/sf0.001"}""" + "\n" +
        """{"shared_build_sec":52.0,"rerun":false,"sf":"/t/sf0.1"}""" + "\n")
    val got = Bench.sharedBaseline(d, Some("/t/sf0.1"))
    // median of {50, 52}, the tiny sf0.001 line filtered out
    assert(got.isDefined && math.abs(got.get._1 - 52.0) < 1e-9, got)
    // unfiltered call keeps all three (median 50) — back-compat
    val all = Bench.sharedBaseline(d)
    assert(all.isDefined && math.abs(all.get._1 - 50.0) < 1e-9, all)
  }

  test("BENCH_FULL.json is the last resort; empty dir yields None " +
    "(which main LOGS rather than silently disabling the guard)") {
    val d = tmpDir()
    assert(Bench.sharedBaseline(d).isEmpty)
    Files.writeString(d.resolve("BENCH_FULL.json"),
      """{"metric":"total","value":1.0,"shared_build_sec":51.62,"x":1}""")
    val got = Bench.sharedBaseline(d)
    assert(got.isDefined && math.abs(got.get._1 - 51.62) < 1e-9, got)
    assert(got.get._2.contains("BENCH_FULL"))
  }

  test("the REAL committed records in this checkout produce a baseline") {
    val repo = Paths.get(Bench.repoDir)
    assume(Files.exists(repo.resolve("BENCH_r14.json")))
    // ignore any history file (may not exist yet in this round) —
    // prove the record-parsing leg works on the genuine artifacts
    // the r14 ADVICE showed the old regex matched nothing in
    val got = Bench.sharedBaseline(repo)
    assert(got.isDefined, "committed records must yield a baseline")
    // a plausible shared build: r12–r14 measured 49–140 s
    assert(got.get._1 > 5.0 && got.get._1 < 500.0, got)
  }
}

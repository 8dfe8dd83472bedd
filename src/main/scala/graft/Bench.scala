package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Benchmark main. Prints ONE compact JSON line (the driver contract)
  * and writes the FULL result to `BENCH_FULL.json` in the repo root —
  * rounds 2–4 lost their totals because the driver stores only a
  * ~3 KB log tail and the full-precision line truncated mid-JSON, so
  * the printed line is kept short (3-decimal times) and the complete
  * record lives in the file.
  *
  * Two back-to-back timed sweeps: pass 1 lands one-time costs that
  * escaped the shared build (JIT, codegen caches, parquet footer
  * reads, persist fills); pass 2 — the `queries` field and the
  * headline `value` — is the comparable number across rounds and
  * hosts (the co-tenant noise postmortem in VERDICT r4: same code
  * swung 2–4× between single-pass runs). `value` = `_shared_build` +
  * warm-pass sum, matching BASELINE.md's accounting.
  *
  * Attribution (round-10 verdict #1): the session-shared snapshot
  * builds run FIRST, serially, one timer per NAMED component — the
  * `_shared:<name>` rows in `queries` — so no first-touch snapshot
  * cost ever lands on whichever query happens to run first in the
  * cold sweep. `_shared_build` is the components' sum. Every query
  * row carries the 1-min load average at START and END (a 50 s
  * query's start stamp alone understates co-tenant noise).
  *
  * The warm pass is NEVER skipped (round-10 verdict #1: a cold-only
  * artifact cannot be band-compared). If the wall budget
  * (`SPARK_GRAFT_TIME_BUDGET_SEC`, default 2100 s) runs short, the
  * warm sweep is TRUNCATED mid-pass instead — cheapest-first order
  * maximizes how many queries get a warm number, unreached queries
  * keep their cold time in the merged `queries` map, and the record
  * is flagged `warm_partial` with the measured count.
  *
  * Load-transient guard (round-13 verdict #4): a shared build reading
  * >1.5× the trailing-round median is rerun ONCE in a fresh session
  * before recording — the rerun measures the build, not cache hits,
  * because the first session's caches die with its context. The
  * record carries `shared_rerun` and `shared_first_sec` so the
  * transient stays visible. The baseline (ADVICE r14: the original
  * `_shared_build` regex matched NOTHING in the committed records —
  * the driver stores the line escaped inside a truncated `tail`
  * string) comes from [[sharedBaseline]]: BENCH_SHARED_HISTORY.jsonl
  * (appended by every full run of this main — the durable source
  * going forward), else escape-tolerant parsing of committed
  * BENCH_r*.json tails (sum of the `shared_components` map, which
  * survives truncation because it sits near the line's end), else
  * BENCH_FULL.json's `shared_build_sec`; a missing baseline is
  * LOGGED, never a silent None.
  *
  * Test/iteration envs (all flagged in the record so a filtered run
  * can never be mistaken for a full one):
  *  - `SPARK_GRAFT_BENCH_ONLY` — comma-separated query subset;
  *  - `SPARK_GRAFT_BENCH_OUT` — full-record filename (default
  *    BENCH_FULL.json; the fire test must not clobber the cost-order
  *    source);
  *  - `SPARK_GRAFT_SHARED_MEDIAN_OVERRIDE` — forces the guard's
  *    baseline, validating the FIRE path end-to-end (r14 verdict #3:
  *    only the no-false-positive half had ever run).
  * Runs with any of these set do NOT append to the history file.
  *
  * Timeout-proof (round-6 postmortem: rc-124 at ~49 min left NO numbers
  * because the only JSON was printed at process end):
  *   - every finished query appends a line to `BENCH_PARTIAL.jsonl`;
  *   - a JVM shutdown hook prints the driver-contract line from whatever
  *     completed (marked `"partial":true`) if the normal print never ran —
  *     `timeout(1)` sends SIGTERM, which runs hooks;
  *   - sweeps run cheapest-first (committed BENCH_FULL.json warm times),
  *     so a kill mid-sweep preserves the most per-query numbers.
  */
object Bench {
  /** Repo root for records/partials: env override, else the launch
    * cwd (sbt and gate.sh both run from the checkout) — never a
    * hardcoded /root/repo (ADVICE r14: the same bug class gate.sh
    * fixed — a wrong-checkout run read/wrote another repo's records). */
  private[graft] def repoDir: String =
    sys.env.getOrElse("SPARK_GRAFT_REPO_DIR",
      sys.props.getOrElse("user.dir", "."))

  /** Trailing shared-build baseline for the load-transient guard, in
    * precedence order; returns (seconds, source) so the guard can log
    * WHAT it compared against. All parsing is escape-tolerant
    * (`\\?"` matches both raw JSON and the driver's `tail`-escaped
    * form) because the committed records store the printed line as an
    * escaped string whose HEAD — including `_shared_build` — is
    * usually truncated away; the `shared_components` map sits near
    * the end and survives, and its sum IS the shared build.
    */
  private[graft] def sharedBaseline(dir: java.nio.file.Path,
      sfDir: Option[String] = None): Option[(Double, String)] = {
    import scala.jdk.CollectionConverters._
    def median(vs: Seq[Double]): Option[Double] =
      if (vs.isEmpty) None else Some(vs.sorted.apply(vs.size / 2))
    // (a) our own durable history: one line per completed full run.
    // Lines are filtered to the CURRENT sf dir when given (ADVICE
    // r15: one full run against sf0.001 would otherwise inject a
    // tiny shared-build time and skew the 1.5× guard baseline);
    // lines without an sf field are kept for back-compat.
    val hist = dir.resolve("BENCH_SHARED_HISTORY.jsonl")
    val fromHist: Option[(Double, String)] = try {
      if (!Files.exists(hist)) None
      else {
        val re = """"shared_build_sec":([0-9.]+)""".r
        val sfRe = """"sf":"([^"]*)"""".r
        val vals = Files.readAllLines(hist).asScala.toSeq
          .filter(l => sfDir.forall(want =>
            sfRe.findFirstMatchIn(l).forall(_.group(1) == want)))
          .flatMap(l => re.findFirstMatchIn(l).map(_.group(1).toDouble))
          .takeRight(5)
        median(vals).map(_ -> s"history median of last ${math.min(5, vals.size)}")
      }
    } catch { case _: Throwable => None }
    // (b) committed driver records: escaped, head-truncated tails
    val fromRecords: Option[(Double, String)] = try {
      val direct = """\\?"_shared_build\\?":([0-9.]+)""".r
      val compObj = """\\?"shared_components\\?":\{(.*?)\}""".r
      val pair = """\\?"[A-Za-z_0-9]+\\?":([0-9.]+)""".r
      val vals = Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.matches("BENCH_r\\d+\\.json"))
        .toSeq.sortBy(_.getFileName.toString)
        .flatMap { p =>
          val txt = Files.readString(p)
          direct.findFirstMatchIn(txt).map(_.group(1).toDouble)
            .orElse(compObj.findFirstMatchIn(txt).map(m =>
              pair.findAllMatchIn(m.group(1))
                .map(_.group(1).toDouble).sum).filter(_ > 0.0))
        }.takeRight(5)
      median(vals).map(_ ->
        s"BENCH_r*.json median of last ${math.min(5, vals.size)}")
    } catch { case _: Throwable => None }
    // (c) the last local full record (single value, weakest)
    val fromFull: Option[(Double, String)] = try {
      val p = dir.resolve("BENCH_FULL.json")
      if (!Files.exists(p)) None
      else """"shared_build_sec":([0-9.]+)""".r
        .findFirstMatchIn(Files.readString(p))
        .map(m => m.group(1).toDouble -> "BENCH_FULL.json shared_build_sec")
    } catch { case _: Throwable => None }
    fromHist.orElse(fromRecords).orElse(fromFull)
  }

  @volatile private var finalPrinted = false
  @volatile private var stopping = false
  // (pass, name, sec) in completion order; read by the shutdown hook.
  private val done =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Double)]
  @volatile private var sharedSec = 0.0
  @volatile private var sharedRows = Seq.empty[(String, Double)]
  @volatile private var sfDirG = ""
  @volatile private var outNameG = "BENCH_FULL.json"

  private def f3(v: Double): String =
    // Locale.ROOT: f"%.3f" under a comma-decimal default locale
    // (de_DE, fr_FR) would print 12,345 and corrupt the JSON
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def obj(entries: Seq[(String, Double)], fmt: Double => String) =
    entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")

  private def compactLine(
      queries: Seq[(String, Double)], total: Double, coldSum: Double,
      flags: String): String =
    // shared-build decomposition rides its OWN field (mirroring
    // BENCH_FULL's shared_components), NOT the queries object: a
    // consumer reconstructing value = _shared_build + sum(queries)
    // must not double-count the components. Components skipped by a
    // mid-run SIGTERM (0.0 stubs) are dropped, not reported as
    // misleading 0.000 rows.
    s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
      s""","queries":${obj(("_shared_build" -> sharedSec) +: queries, f3)}""" +
      s""","shared_components":${obj(
        sharedRows.filter(_._2 > 0.0), f3)}""" +
      s""","sf":"$sfDirG","cold_total":${f3(coldSum)}$flags""" +
      s""","detail":"$outNameG"}"""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sfDirG = sfDir
    outNameG = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budget =
      sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET_SEC", "2100").toDouble
    val tStart = System.nanoTime()
    def elapsed = (System.nanoTime() - tStart) / 1e9
    def mkSession(): SparkSession = {
      val s = graft.core.Tuning.defaults(SparkSession.builder()
        .master(s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    // var: the shared-build transient guard below may replace the
    // session wholesale (a rerun against warm caches would measure
    // cache hits, not the build)
    var spark = mkSession()

    // If SIGTERM'd (driver timeout), salvage the run. A warm pass killed
    // 2 queries in must NOT report shared + 2 warm times as the total —
    // that understates the run and reads as a bogus speedup. Merge the
    // passes per-query: warm time where the warm pass reached the query,
    // that query's cold time otherwise, so the partial total stays
    // comparable to a full run. The `stopping` flag also halts the sweep
    // loop — post-shutdown queries would otherwise fail in milliseconds
    // and pollute the record with bogus near-zero times.
    val hook = new Thread(() => {
      stopping = true
      if (!finalPrinted) {
        val rows = done.toArray(Array.empty[(String, String, Double)])
        val warm = rows.collect { case ("warm", n, s) => n -> s }.toSeq
        val cold = rows.collect { case ("cold", n, s) => n -> s }.toSeq
        val warmByName = warm.toMap
        val merged =
          if (warm.isEmpty) cold
          else cold.map { case (n, s) => n -> warmByName.getOrElse(n, s) }
        val total = sharedSec + merged.map(_._2).sum
        val pass = if (warm.isEmpty) "cold"
                   else if (warmByName.size < cold.size) "merged" else "warm"
        println(compactLine(merged, total, cold.map(_._2).sum,
          s""","partial":true,"pass":"$pass""""))
        System.out.flush()
      }
    })
    Runtime.getRuntime.addShutdownHook(hook)

    val partialPath = Paths.get(repoDir, "BENCH_PARTIAL.jsonl")
    try Files.deleteIfExists(partialPath) catch { case _: Throwable => () }
    def flush(pass: String, name: String, sec: Double,
              load: Double, loadEnd: Double): Unit = {
      // A query in flight at SIGTERM fails when Spark tears down; its
      // truncated elapsed time is not a measurement — drop it.
      if (stopping) return
      done.add((pass, name, sec))
      try Files.writeString(partialPath,
        s"""{"pass":"$pass","query":"$name","sec":${f3(sec)},""" +
          s""""load":${f3(load)},"load_end":${f3(loadEnd)}}""" + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      catch { case _: Throwable => () }
    }

    def loadAvg: Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    val load0 = loadAvg
    // One-time session-shared builds, one NAMED component at a time
    // (serial — overlapping them would make the per-component timers
    // lie about wall cost; attribution outranks the wall-time saving
    // here because every later cold number reads against these rows).
    def runShared(pass: String): Seq[(String, Double, Double, Double)] =
      SparkEntry.sharedComponents.map { case (name, f) =>
        if (stopping) (name, 0.0, 0.0, 0.0)
        else {
          val lq = loadAvg
          val t0 = System.nanoTime()
          try f(spark, sfDir) catch { case _: Throwable => () }
          val sec = (System.nanoTime() - t0) / 1e9
          val le = loadAvg
          flush(pass, s"_$pass:$name", sec, lq, le)
          (name, sec, lq, le)
        }
      }
    var sharedL = runShared("shared")
    sharedRows = sharedL.map { case (n, s, _, _) => n -> s }
    var shared = sharedRows.map(_._2).sum

    // Shared-build load-transient guard (r13 verdict #4): the r13
    // driver artifact's cold total carried a ~49 s shared-build
    // transient (gate JVMs had just exited) that a serial re-measure
    // reproduced away — the builder had to explain it in prose. If
    // this round's shared total reads >1.5× the trailing-round
    // median (committed BENCH_r*.json records), rerun it ONCE in a
    // FRESH session (the caches die with the stopped context, so the
    // rerun measures the build, not cache hits) and record both.
    val sharedFirst = shared
    var sharedRerun = false
    // SPARK_GRAFT_SHARED_MEDIAN_OVERRIDE: test-only forced baseline —
    // the only way to exercise the fire path deterministically
    // (r14 verdict #3); flagged via benchOnly/outName, never appended
    // to history.
    val overrideMedian =
      sys.env.get("SPARK_GRAFT_SHARED_MEDIAN_OVERRIDE").map(_.toDouble)
    val trailingMedian: Option[Double] = overrideMedian.orElse {
      sharedBaseline(Paths.get(repoDir), Some(sfDir)) match {
        case Some((v, src)) =>
          System.err.println(f"[bench] shared-build baseline $v%.1f s ($src)")
          Some(v)
        case None =>
          System.err.println("[bench] no shared-build baseline found " +
            "(checked BENCH_SHARED_HISTORY.jsonl, BENCH_r*.json, " +
            "BENCH_FULL.json) - transient guard disabled this run")
          None
      }
    }
    if (!stopping && trailingMedian.exists(m => shared > 1.5 * m)) {
      System.err.println(f"[bench] shared build $shared%.1f s > 1.5x " +
        f"trailing median ${trailingMedian.get}%.1f s - rerunning in " +
        "a fresh session")
      sharedRerun = true
      spark.stop()
      spark = mkSession()
      sharedL = runShared("shared_rerun")
      sharedRows = sharedL.map { case (n, s, _, _) => n -> s }
      shared = sharedRows.map(_._2).sum
    }
    sharedSec = shared

    // Cheapest-first: a mid-sweep kill preserves the most numbers; order
    // comes from the previous committed record, absent → registration order.
    val costOrder: Map[String, Double] = try {
      val txt = Files.readString(Paths.get(repoDir, "BENCH_FULL.json"))
      val qobj = """"queries":\{([^}]*)\}""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
      """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(qobj)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty[String, Double] }
    // SPARK_GRAFT_BENCH_ONLY: iteration/fire-test subset — flagged in
    // the record ("bench_only") so a filtered run is never mistaken
    // for a full one; unknown names fail fast like Verify's arg check.
    val benchOnly: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    benchOnly.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY unknown: ${unknown.mkString(", ")}")
    }
    val ordered = SparkEntry.queries.toList
      .filter { case (n, _) => benchOnly.forall(_.contains(n)) }
      .sortBy { case (name, _) => costOrder.getOrElse(name, 1e9) }

    // Per-query 1-min load average, stamped at query START and END —
    // the round-9 postmortem: run-level load_avg_start/end (3.15→15.0)
    // could not attribute which warm outliers were co-tenant noise,
    // and a START-only stamp understates a long query's exposure.
    // `stopAt`: the warm pass truncates on budget rather than being
    // skipped wholesale — unreached queries keep cold numbers.
    def sweep(pass: String, stopAt: Double)
        : List[(String, Double, Double, Double)] = ordered.iterator
      .takeWhile(_ => !stopping && elapsed < stopAt)
      .map { case (name, fn) =>
        val lq = loadAvg
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        val le = loadAvg
        flush(pass, name, sec, lq, le)
        (name, sec, lq, le)
      }.toList
    // The cold pass never truncates on its own (every query needs at
    // least one number; the SIGTERM hook covers a hard driver kill);
    // the warm pass then uses whatever budget remains, up to a 5%
    // print/teardown reserve. NEVER skip the warm pass outright — a
    // cold-only artifact cannot be band-compared across rounds.
    val coldL = sweep("cold", Double.MaxValue)
    val cold = coldL.map { case (n, s, _, _) => n -> s }
    // Guaranteed warm window: if the cold pass already ate the 95%
    // mark (observed in the tight-budget shakeout: warm_measured=0 —
    // a cold-only artifact again, exactly what this protocol exists
    // to prevent), still give the warm sweep 15% of the budget. The
    // SIGTERM salvage hook covers the case where that overrun meets
    // the driver's hard timeout — a partial-merged record beats a
    // warmless one.
    val warmL = sweep("warm", math.max(budget * 0.95,
      elapsed + budget * 0.15))
    val warmMeasured = warmL.map { case (n, s, _, _) => n -> s }
    val warmByName = warmMeasured.toMap
    val warmPartial = warmMeasured.size < cold.size
    // merged per-query map: warm where measured, cold elsewhere — the
    // comparable accounting whether or not the pass truncated
    val warm = cold.map { case (n, s) => n -> warmByName.getOrElse(n, s) }
    val loadEnd = loadAvg
    val coldSum = cold.map(_._2).sum
    val warmSum = warm.map(_._2).sum
    val total = shared + warmSum

    val sharedObj = obj(
      sharedL.map { case (n, s, _, _) => s"_shared:$n" -> s }, _.toString)
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec",
         |"sf":"$sfDir","shared_build_sec":$shared,
         |"shared_components":$sharedObj,
         |"shared_load":${obj(
            sharedL.map { case (n, _, l, _) => s"_shared:$n" -> l }, f3)},
         |"cold_pass_sec":$coldSum,"warm_pass_sec":$warmSum,
         |"shared_rerun":$sharedRerun,"shared_first_sec":$sharedFirst,
         |"warm_partial":$warmPartial,
         |"bench_only":${benchOnly.map(_.size).getOrElse(0)},
         |"median_override":${overrideMedian.isDefined},
         |"warm_measured":${warmMeasured.size},
         |"load_avg_start":$load0,"load_avg_end":$loadEnd,
         |"queries":${obj(warm, _.toString)},
         |"queries_cold":${obj(cold, _.toString)},
         |"queries_load":${obj(
            warmL.map { case (n, _, l, _) => n -> l }, f3)},
         |"queries_load_end":${obj(
            warmL.map { case (n, _, _, le) => n -> le }, f3)},
         |"queries_cold_load":${obj(
            coldL.map { case (n, _, l, _) => n -> l }, f3)},
         |"queries_cold_load_end":${obj(
            coldL.map { case (n, _, _, le) => n -> le }, f3)}}
         |""".stripMargin.replace("\n", "")
    // If the SIGTERM hook is already salvaging, the sweeps above were
    // truncated — writing/printing HERE would overwrite BENCH_FULL.json
    // with a truncated record and emit a SECOND (junk) driver line after
    // the hook's good partial one (observed in the kill test).
    if (!stopping) {
      // never let a failed file write (read-only checkout, missing dir)
      // swallow the driver-contract line below — the sweeps already ran
      val outName = outNameG
      try Files.writeString(Paths.get(repoDir, outName), full + "\n")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $outName write failed: $e") }
      // durable shared-build history (the guard's primary baseline):
      // full, un-forced runs only — a filtered or override run would
      // bias the median with an unrepresentative build or a synthetic
      // decision.
      if (benchOnly.isEmpty && overrideMedian.isEmpty &&
          outName == "BENCH_FULL.json") {
        try Files.writeString(Paths.get(repoDir, "BENCH_SHARED_HISTORY.jsonl"),
          s"""{"shared_build_sec":${f3(shared)},"rerun":$sharedRerun,""" +
            s""""first_sec":${f3(sharedFirst)},"sf":"$sfDir"}""" + "\n",
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] history append failed: $e") }
      }
      // compact driver line: warm-pass per-query times, 3 decimals.
      val flags = (if (warmPartial)
        s""","warm_partial":true,"warm_measured":${warmMeasured.size}"""
      else "") + (if (benchOnly.isDefined)
        s""","bench_only":${ordered.size}"""
      else "") + (if (sharedRerun)
        s""","shared_rerun":true,"shared_first_sec":${f3(sharedFirst)}"""
      else "")
      // mark BEFORE printing: a SIGTERM between println and the flag
      // assignment would make the hook emit a second driver line
      finalPrinted = true
      println(compactLine(warm, total, coldSum, flags))
      spark.stop()
    }
  }
}

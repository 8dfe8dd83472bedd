package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Per-action fixed-cost profiler (r17 warm-tail work): for each named
  * query, splits one warm invocation into
  *   build   — `fn(spark, dir)` DataFrame construction (incl. any
  *             parquet footer/listing I/O the builders do eagerly),
  *   plan    — analysis + optimization + physical planning
  *             (`queryExecution.executedPlan` forced),
  *   exec    — the `count()` the bench times,
  * and counts the Spark jobs the action launched (a listener; AQE runs
  * one job per materialized stage, broadcasts ride their own jobs).
  * Queries are run once un-timed first (session caches, JIT) so the
  * numbers are the steady-state floor, then `reps` timed invocations
  * with fresh plans each time — exactly the bench's warm shape.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    // SPARK_GRAFT_PROF_CONF: "k=v;k=v" extra confs for quick A/Bs
    val extra = sys.env.getOrElse("SPARK_GRAFT_PROF_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extra.foldLeft(graft.core.Tuning.defaults(
      SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warmup: session caches, codegen, JIT
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      for (i <- 1 to reps) {
        val (df, tBuild) = t(fn(spark, sfDir))
        val (_, tPlan) = t(df.queryExecution.executedPlan)
        jobs.set(0)
        val (n, tExec) = t(df.count())
        // listener events are async; give the queue a beat
        Thread.sleep(150)
        println(f"PROF $name rep$i build=$tBuild%.3f plan=$tPlan%.3f " +
          f"exec=$tExec%.3f jobs=${jobs.get()} rows=$n")
      }
    }
    spark.stop()
  }
}

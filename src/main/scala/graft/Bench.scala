package graft
import org.apache.spark.sql.SparkSession

/** Throughput benchmark over every SparkEntry query.
  *
  * Protocol (per query): one untimed warmup run (JVM/codegen/parquet
  * footers), then k=3 timed runs with the SQL cache CLEARED before each
  * so internal .cache() calls redo their real compute; the reported
  * figure is the MEDIAN of the three — a single descheduled run under
  * background load cannot masquerade as a regression (round-3 driver
  * benches were noise-dominated for exactly that reason).
  *
  * Output: ONE JSON line on stdout (the driver contract; per-query
  * MEDIANS only — the per-run triples made the line long enough that
  * the driver's stdout tail truncated it) AND a superset JSON written
  * to a file (`SPARK_GRAFT_BENCH_OUT`, default BENCH_LOCAL.json in the
  * repo root) carrying the full per-run record. Both carry the 1-minute
  * system load average sampled before and after the sweep so a loaded
  * machine is visible in the record, and per-query error flags — a
  * throwing query records `"err"` (median null, name in `"errors"`),
  * never a near-zero timing masquerading as a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_LOCAL.json")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadBefore = loadAvg
    // A query that THROWS must never masquerade as a fast timing: the
    // run records an error flag instead of a near-zero duration, the
    // median over surviving runs is null if every run failed, and the
    // failed query names travel in a top-level "errors" list.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def runOnce(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, err)
      }
      runOnce() // untimed warmup (JVM/codegen/parquet footers)
      val runsOut = (1 to runs).map(_ => runOnce())
      val ok = runsOut.collect { case (dt, None) => dt }.sorted
      // lower-middle for even k — deterministic, never a made-up average
      val median = if (ok.isEmpty) None else Some(ok((ok.length - 1) / 2))
      val firstErr = runsOut.collectFirst { case (_, Some(e)) => e }
      name -> ((median, runsOut, firstErr))
    }
    val loadAfter = loadAvg
    // Locale.ROOT: a comma-decimal default locale would otherwise emit
    // "0,5600" and corrupt both the stdout contract and the JSON file
    def f(d: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, d)
    def fm(m: Option[Double]): String = m.fold("null")(f)
    val qs = results.map { case (k, (m, _, _)) => s"\"$k\":${fm(m)}" }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, (_, ts, _)) =>
      val cells = ts.map { case (dt, err) =>
        err.fold(f(dt))(e => s"""{"sec":${f(dt)},"err":"$e"}""") }
      s"\"$k\":[${cells.mkString(",")}]" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, _, Some(e))) => s""""$k":"$e"""" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2._1).sum
    val nErr = results.count(_._2._3.isDefined)
    def envelope(body: String): String =
      s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
        s""""queries":$qs,$body"n_errors":$nErr,"errors":$errs,"k":$runs,""" +
        s""""load_avg_before":${f(loadBefore)},"load_avg_after":${f(loadAfter)},""" +
        s""""sf":"$sfDir"}"""
    val fileJson = envelope(s""""runs":$rs,""")
    // stdout stays medians-only: the full per-run record made the line
    // long enough that the driver's stdout tail truncated it every
    // round ("parsed": null) — the file carries the complete sweep.
    val stdoutJson = envelope("")
    try {
      val p = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.write(p, fileJson.getBytes("UTF-8"))
      System.err.println(s"bench json written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"bench file write failed: $e") }
    println(stdoutJson)
    spark.stop()
  }
}

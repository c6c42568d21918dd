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
  * Output: ONE JSON line on stdout (the driver contract) AND the same
  * JSON written to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * BENCH_LOCAL.json in the repo root) — stdout tails get truncated by
  * the harness, files don't. The JSON carries per-query medians, the
  * per-run triples, and the 1-minute system load average sampled before
  * and after the sweep so a loaded machine is visible in the record.
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      spark.catalog.clearCache()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.sorted
      // lower-middle for even k — deterministic, never a made-up average
      val median = times((times.length - 1) / 2)
      name -> ((median, times))
    }
    val loadAfter = loadAvg
    // Locale.ROOT: a comma-decimal default locale would otherwise emit
    // "0,5600" and corrupt both the stdout contract and the JSON file
    def f(d: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val qs = results.map { case (k, (m, _)) => s"\"$k\":${f(m)}" }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, (_, ts)) =>
      s"\"$k\":[${ts.map(f).mkString(",")}]" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val json = s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
      s""""queries":$qs,"runs":$rs,"k":$runs,""" +
      s""""load_avg_before":${f(loadBefore)},"load_avg_after":${f(loadAfter)},""" +
      s""""sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      System.err.println(s"bench json written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"bench file write failed: $e") }
    println(json)
    spark.stop()
  }
}

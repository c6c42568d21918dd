package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** FULL-SURFACE one-decade sweep: every `SparkEntry.queries` entry at
  * sf0.1 AND the ScaleGen-amplified sf1, one number per query — the
  * round-10 extension of ScaleBench (which covers only the known
  * scale-sensitive family). Purpose: catch the next q113-class shape
  * hiding in an operator nobody suspected — a stage that is quadratic
  * in a quantity that happens to be small at sf0.1.
  *
  * Protocol: per query, run at dirA then dirB back-to-back (so JIT/
  * codegen state is comparable between the two measurements), record
  * wall seconds, result rows, and shuffle write volume/records. Wall
  * time at these sizes is overhead-heavy, so — as in ScaleBench — the
  * rows/shuffle ratios are the load-bearing signal and time is
  * orientation. The final FLAGGED block lists queries whose growth
  * cannot be explained by the known benign mechanisms (plan flips at
  * size thresholds, hash-redraw truth mass — see SCALECHECK_SF1.md):
  * rows > 2.5·factor, shuffle records > 25·factor, or time >
  * 4·factor. Flags are DIAGNOSTIC output for adjudication, not a
  * gate — the sweep always exits 0 so one noisy query cannot mask the
  * rest of the table.
  *
  * Usage: runMain graft.ScaleSweep [dirA dirB [factor]]
  */
object ScaleSweep {

  private class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong
    val records = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.length >= 2) args.take(2).toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/scale/sf1")
    val factor = if (args.length > 2) args(2).toDouble else 10.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // Optional subset: query names after the factor arg restrict the
    // sweep (e.g. a new-operator batch) instead of the full surface.
    val subset = args.drop(3).toSet
    subset.foreach(q => require(SparkEntry.queries.contains(q),
      s"unknown query '$q'"))
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => subset.isEmpty || subset(q._1))
    // (query, dir) -> (secs, rows, shuffleBytes, shuffleRecords)
    val out = collection.mutable.Map
      .empty[(String, String), (Double, Long, Long, Long, Option[String])]
    for ((name, fn) <- queries; dir <- dirs) {
      val t0 = System.nanoTime()
      val (rows, err) =
        try (fn(spark, dir).count(), None)
        catch { case e: Throwable => (-1L, Some(e.getClass.getSimpleName)) }
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // let async stage-completed events drain
      val (b, r) = (meter.bytes.getAndSet(0L), meter.records.getAndSet(0L))
      out((name, dir)) = (secs, rows, b, r, err)
      val e = err.fold("")(x => s""","err":"$x"""")
      println(f"""{"query":"$name","dir":"$dir","secs":$secs%.3f,"rows":$rows,"shuffle_bytes":$b,"shuffle_records":$r$e}""")
    }

    val (a, bDir) = (dirs(0), dirs(1))
    println(s"RATIOS (dirB / dirA; corpus factor = $factor)")
    println(f"${"query"}%-26s ${"time_x"}%8s ${"rows_x"}%8s ${"shufB_x"}%8s ${"shufR_x"}%8s")
    val flagged = collection.mutable.ArrayBuffer.empty[String]
    for ((name, _) <- queries) {
      val (ta, ra, ba, sa, ea) = out((name, a))
      val (tb, rb, bb, sb, eb) = out((name, bDir))
      if (ea.isDefined || eb.isDefined) {
        println(f"$name%-26s ERR ${ea.orElse(eb).get}")
        flagged += s"$name: error ${ea.orElse(eb).get}"
      } else {
        def ratio(x: Long, y: Long) = if (x == 0) 0.0 else y.toDouble / x
        val tx = if (ta > 0) tb / ta else 0.0
        val rx = ratio(ra, rb); val bx = ratio(ba, bb); val sx = ratio(sa, sb)
        println(f"$name%-26s $tx%8.2f $rx%8.2f $bx%8.2f $sx%8.2f")
        if (rx > factor * 2.5) flagged += f"$name: rows $rx%.1fx"
        if (sx > factor * 25.0) flagged += f"$name: shuffle records $sx%.1fx"
        if (tx > factor * 4.0) flagged += f"$name: time $tx%.1fx"
      }
    }
    println(if (flagged.isEmpty) "FLAGGED: none"
      else "FLAGGED:\n  " + flagged.mkString("\n  "))
    spark.stop()
  }
}

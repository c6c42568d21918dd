package graft
import org.apache.spark.sql.SparkSession

object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Structural counters (round 16): jobs/stages/tasks + shuffle bytes
    // per timed run, so an optimization's claim ("one exchange removed
    // per hop", "k jobs collapsed to one") is checkable from this
    // instrument's output instead of inferred from wall-clock alone.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
          shufWrite.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(
            s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        }
      })
    def snap(): (Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shufWrite.get, shufRead.get)
    def stats(before: (Long, Long, Long, Long, Long)): String = {
      Thread.sleep(400) // listener bus drains async; settle before reading
      val a = snap()
      f"jobs=${a._1 - before._1} stages=${a._2 - before._2} " +
        f"tasks=${a._3 - before._3} shufW=${(a._4 - before._4) / 1e6}%.1fMB " +
        f"shufR=${(a._5 - before._5) / 1e6}%.1fMB"
    }
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      val s1 = snap()
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING2 $name ${(System.nanoTime()-t1)/1e9}%.2f s [${stats(s1)}]")
    }
    spark.stop()
  }
}

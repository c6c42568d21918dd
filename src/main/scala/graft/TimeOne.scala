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
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING2 $name ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}

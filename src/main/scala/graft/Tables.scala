package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * All operators take a `dir` (scale-factor directory) and read parquet
  * directly so Catalyst sees the scan and can push filters/projections
  * into it. At cluster scale these would be external tables; the access
  * pattern (columnar scan + pushdown) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** SQL conf every graft session needs: the events table stores ts as
    * parquet TIMESTAMP(NANOS), which Spark 4 refuses unless this legacy
    * conf reads it as a long. Entry points (Verify/Bench/TimeOne/Explain
    * and the test session) apply it AT SESSION BUILD — a loader must not
    * mutate session-global conf as a side effect of a read (it could
    * change unrelated reads mid-session). */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** The events table stores ts as parquet TIMESTAMP(NANOS), read as a
    * long (ns since epoch — see requiredConf), then converted to a
    * microsecond timestamp with integral division (`div` — a double
    * division would lose precision on ~1.7e18 ns values). */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true on the session " +
        "(Tables.requiredConf) before reading the events table")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

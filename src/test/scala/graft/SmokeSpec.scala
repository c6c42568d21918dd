package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Data-contract canary: loads EVERY table at sf0.001 through the typed
  * loaders and checks rows > 0 plus the few schema invariants operators
  * rely on. If the driver regenerates the testdata with a changed
  * physical schema (as happened in round 7, when events.ts moved from
  * int64-nanos to native timestamp[us]), this suite fails in seconds
  * with the table name in the message — instead of 27 cryptic failures
  * spread over five suites.
  */
class SmokeSpec extends SparkSpec {

  test("every table loads and is non-empty at sf0.001") {
    for (name <- Tables.names) {
      val df = name match {
        case "events" => Tables.events(spark, sf)
        case n        => Tables.load(spark, sf, n)
      }
      assert(df.count() > 0, s"table $name is empty or unreadable at $sf")
    }
  }

  test("events.ts normalizes to session-local TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts is ${ev.schema("ts").dataType}, operators expect TimestampType")
    // A timestamp-typed filter must analyze — this is exactly what broke r7.
    import org.apache.spark.sql.functions._
    val d = ev.select(min("ts").cast("date").as("d")).head.getDate(0)
    assert(d.toString >= "2000-01-01" && d.toString <= "2030-12-31",
      s"events.ts min date $d is outside a plausible range — conversion bug?")
  }

  test("events loader still reads the legacy int64-nanos generation") {
    import org.apache.spark.sql.functions._
    // Synthesize the OLD on-disk shape (ts as a long of ns since epoch)
    // and check the loader's LongType branch converts to the same
    // instant the native-timestamp branch would produce.
    import SparkTestSession.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_legacy_events")
      .toString
    val tsUs = 1718000000000000L // 2024-06-10T06:13:20Z in µs
    Seq((1L, tsUs * 1000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).head.getLong(0) == tsUs)
    // best-effort cleanup; temp dir is per-run anyway
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
  }

  test("key columns the operator families depend on exist with stable types") {
    val doc = Tables.documents(spark, sf)
    for (c <- Seq("doc_id", "text", "lang", "source"))
      assert(doc.columns.contains(c), s"documents.$c missing")
    val emb = Tables.embeddings(spark, sf)
    for (c <- Seq("vec_id", "embedding", "label"))
      assert(emb.columns.contains(c), s"embeddings.$c missing")
    val ev = Tables.events(spark, sf)
    for (c <- Seq("event_id", "user_id", "event_type", "ts"))
      assert(ev.columns.contains(c), s"events.$c missing")
    assert(Tables.lineitem(spark, sf).schema("l_orderkey").dataType == LongType ||
      Tables.lineitem(spark, sf).schema("l_orderkey").dataType.typeName.startsWith("int"),
      "lineitem.l_orderkey is not integral")
  }
}

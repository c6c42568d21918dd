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

  test("q182 BM25 store publishes the layout its readers prune on") {
    // Store-layout canary (round 10): the persisted BM25 index must
    // keep its published shape — postings/df directory-partitioned by
    // the 64-way token-hash bucket (the prefix queries prune to),
    // doclen, and the 1-row stats written last. If a refactor (or a
    // driver-side scratch wipe mid-build) changes the layout, this
    // fails in seconds with the missing piece named, instead of q182
    // silently rebuilding (r8's 5.7x bench regression) or misreading.
    val dir = graft.sources.VersionedStore.resolveOrBuild(
      spark, ops.Scratch.dir(spark, sf, "bm25idx"))(
      p => ops.Text.writeBm25Index(Tables.documents(spark, sf),
        "doc_id", "text", p))
    val root = new java.io.File(dir)
    for (piece <- Seq("postings", "dfreq", "docstats", "stats"))
      assert(new java.io.File(root, piece).isDirectory,
        s"bm25 store piece missing: $piece under $dir")
    val buckets = new java.io.File(root, "postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
    assert(buckets.nonEmpty, "postings are not bucket-partitioned")
    assert(spark.read.parquet(s"$dir/stats").count() == 1,
      "stats must hold exactly the one corpus row")
  }

  test("q189 semantic store publishes the layout its readers prune on") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sf)
    val dir = graft.sources.VersionedStore.resolveOrBuild(
      spark, ops.Scratch.dir(spark, sf, "semstore"))(
      p => ops.Similarity.writeSemDedupStore(
        e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", p))
    val root = new java.io.File(dir)
    for (piece <- Seq("centroids", "kept"))
      assert(new java.io.File(root, piece).isDirectory,
        s"semantic store piece missing: $piece under $dir")
    val kept = spark.read.parquet(s"$dir/kept")
    for (c <- Seq("cell", "e"))
      assert(kept.columns.contains(c), s"kept.$c missing — apply join breaks")
    assert(kept.count() > 0, "kept representatives empty")
    assert(spark.read.parquet(s"$dir/centroids").count() > 0,
      "centroid model empty")
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

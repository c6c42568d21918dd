package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Property + plan-shape checks for the change-data operators (q115–
  * q121 family): interval tiling, single-exchange plans, lookup-join
  * equivalence. */
class ChangesSpec extends SparkSpec {

  test("q116 SCD2 intervals tile each user's timeline exactly") {
    val runs = Changes.q116(spark, sf).cache()
    try {
      // valid_to of version v == valid_from of version v+1; exactly one
      // open (null valid_to) interval per user; versions dense from 1.
      val bad = runs.as("a").join(runs.as("b"),
          col("a.user_id") === col("b.user_id") &&
          col("a.version") + 1 === col("b.version"))
        .filter(col("a.valid_to_us").isNull ||
                col("a.valid_to_us") =!= col("b.valid_from_us"))
        .count()
      assert(bad === 0, s"$bad chained intervals don't tile")
      val opens = runs.groupBy(col("user_id"))
        .agg(sum(when(col("valid_to_us").isNull, 1L).otherwise(0L)).as("n_open"),
             max(col("version")).as("vmax"), count(lit(1)).as("n"))
      assert(opens.filter(col("n_open") =!= 1L).count() === 0,
        "every user needs exactly one open interval")
      assert(opens.filter(col("vmax") =!= col("n")).count() === 0,
        "versions must be dense 1..n")
    } finally runs.unpersist()
  }

  test("q116 SCD2 runs in ONE exchange (all windows share the user partitioning)") {
    val plan = Changes.q116(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("q115 latest-state agg matches the window formulation") {
    val agg = Changes.q115(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val win = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        graft.functions.Cols.cents(col("value")).as("last_value_cents"),
        col("ts_us").as("last_ts_us"), col("n_changes"))
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "max_by compaction and window formulation disagree")
  }

  test("q121 snapshot diff is a single scan of the change stream") {
    val plan = Changes.q121(spark, sf).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected 1 scan, got $scans:\n$plan")
    // statuses cover the overlap design: users exist in every class
    val statuses = Changes.q121(spark, sf)
      .groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.keySet.subsetOf(Set("added", "removed", "changed", "same")))
    assert(statuses.getOrElse("changed", 0L) > 0, "expected changed users")
  }

  test("q118 band lookup equals the CASE-WHEN formulation") {
    val bands = Relational.q118(spark, sf)
    val case_ = Tables.orders(spark, sf)
      .withColumn("band",
        (col("o_totalprice") >= 50000d).cast("long") +
        (col("o_totalprice") >= 100000d).cast("long") +
        (col("o_totalprice") >= 200000d).cast("long") +
        (col("o_totalprice") >= 300000d).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Cols.cents(sum(col("o_totalprice"))).as("sum_cents"))
    val joined = bands.select("band", "n_orders", "sum_cents")
      .exceptAll(case_)
    assert(joined.isEmpty, "rank_bucket bands disagree with CASE bands")
  }

  test("q118 band dimension join is a broadcast (no shuffle for labels)") {
    val plan = Relational.q118(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"band labels not broadcast:\n$plan")
  }

  test("q125 temporal join rides the native AsOfJoinExec, not a range join") {
    val plan = Changes.q125(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"temporal lookup missing AsOfJoinExec:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"temporal lookup degraded to a nested-loop range join:\n$plan")
    // Point-in-time semantics: state one hour back is the interval
    // covering (ts - 1h) — spot-check via a direct computation.
    val out = Changes.q125(spark, sf)
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - 3600000000L).as("probe_us")).collect()
    val scd = Changes.q116(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    val got = out.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    events.take(200).foreach { e =>
      val (eid, uid, p) = (e.getLong(0), e.getLong(1), e.getLong(2))
      val want = scd.filter(s => s._1 == uid && s._4 <= p && p < s._5)
        .map(_._2).headOption.getOrElse(-1L)
      assert(got(eid) == want, s"event $eid: version ${got(eid)} != $want")
    }
  }

  test("q131 RFM plan has no window operator (no single-partition ntile sort)") {
    val plan = Relational.q131(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window crept into RFM:\n$plan")
    // scores are always 1..4 and the segment packs three digits
    val bad = Relational.q131(spark, sf)
      .filter(col("segment") < 111L || col("segment") > 444L).count()
    assert(bad === 0, "segment outside the 111..444 digit range")
  }

  test("q133 hopping windows place every event in exactly size/hop windows") {
    val total = Tables.events(spark, sf).count()
    val windowed = Events.q133(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(windowed === 4L * total, // 1h size / 15min hop = 4 windows each
      s"expected ${4 * total} window memberships, got $windowed")
  }

  test("resampleInterpolate divides negative interpolations like DuckDB //") {
    import SparkTestSession.spark.implicits._
    // key 1: values -100 at t=0 and -201 at t=2_000_000 (1 grid step
    // apart at 1s): midpoint numerator = -301; BOTH Spark's
    // IntegralDivide and DuckDB's // truncate toward zero → -150
    // (a flooring engine would give -151 and break oracle parity).
    val obs = Seq((1L, 0L, 1L, -100L), (1L, 2000000L, 2L, -201L))
      .toDF("k", "ts_us", "seq", "v")
    val out = ops.Events.resampleInterpolate(obs, "k", col("ts_us"), "seq",
        col("v"), 1000000L)
      .orderBy(col("grid_us")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(-100L, -150L, -201L),
      s"got ${out.map(_.getLong(2)).toSeq}")
  }

  test("mergeChanges implements the MERGE INTO row contract") {
    import SparkTestSession.spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (2L, "upsert", "B"),   // matched upsert → replace
      (3L, "delete", "x"),   // matched delete → drop
      (4L, "upsert", "d"),   // unmatched upsert → insert
      (5L, "delete", "x"))   // unmatched delete → no-op
      .toDF("id", "op", "v")
    val got = Changes.mergeChanges(target, changes, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 4L -> "d"), s"merged: $got")
  }

  test("mergeChanges rejects duplicate change keys; seq pre-reduces last-wins") {
    import SparkTestSession.spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // two ops for key 2 in one batch — the CDC micro-batch hazard
    val dup = Seq(
      (2L, "upsert", "B1", 10L),
      (2L, "upsert", "B2", 20L),
      (3L, "upsert", "c", 5L)).toDF("id", "op", "v", "seq")
    // no seq column given → the Delta/Iceberg multiple-matches error,
    // not silent duplicate key rows in the snapshot
    val e = intercept[Exception] {
      Changes.mergeChanges(target, dup.drop("seq"), "id").collect()
    }
    assert(e.getMessage.contains("multiple change rows") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple change rows")),
      s"expected the duplicate-key raise, got: ${e.getMessage}")
    // seq given → last-wins by seq, one row per key, then normal merge
    val got = Changes.mergeChanges(target, dup, "id", seq = Some("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c"), s"merged: $got")
    // a delete losing to a later upsert must act as the upsert
    val flip = Seq((2L, "delete", "x", 1L), (2L, "upsert", "B9", 2L))
      .toDF("id", "op", "v", "seq")
    val got2 = Changes.mergeChanges(target, flip, "id", seq = Some("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(1L -> "a", 2L -> "B9"), s"merged: $got2")
    // TIED seq values for one key are ambiguous — max_by would pick a
    // nondeterministic winner, so the merge must raise (round 11)
    val tied = Seq((2L, "upsert", "A", 5L), (2L, "delete", "-", 5L))
      .toDF("id", "op", "v", "seq")
    val e2 = intercept[Exception] {
      Changes.mergeChanges(target, tied, "id", seq = Some("seq")).collect()
    }
    assert(e2.getMessage.contains("tied sequence") ||
      Option(e2.getCause).exists(_.getMessage.contains("tied sequence")),
      s"expected the tied-seq raise, got: ${e2.getMessage}")
  }

  test("q119 corpus drift: KL non-negative, identical sides drift to ~0") {
    val drift = Text.q119(spark, sf)
    assert(drift.filter(col("kl_nano") < 0L).count() === 0,
      "smoothed KL must be >= 0 (up to per-term rounding)")
    // cross-entropy H(P,Q) = H(P) + KL >= KL since H(P) >= 0.
    assert(drift.filter(col("ce_nano") < col("kl_nano")).count() === 0,
      "H(P,Q) >= KL violated")
    // Identical sides: duplicate every doc once per side — true KL is 0,
    // only per-token nano rounding (±0.5) survives.
    val docs = Tables.documents(spark, sf).select(col("lang"), col("text"))
    val both = docs.withColumn("flip", lit(true))
      .unionByName(docs.withColumn("flip", lit(false)))
    val selfDrift = Text.corpusDrift(both, "lang", "text", col("flip"))
    val maxAbs = selfDrift.agg(max(abs(col("kl_nano")))).collect()(0).getLong(0)
    val vocab = selfDrift.agg(max(col("vocab"))).collect()(0).getLong(0)
    assert(maxAbs <= vocab, s"self-drift |kl| $maxAbs exceeds rounding bound $vocab")
  }
}

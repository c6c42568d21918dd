package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols._

/** Change-data operators: CDC latest-state compaction (upsert apply),
  * SCD-type-2 interval reconstruction, and key-level snapshot diff —
  * the "apply a change stream to a table" surface of a data-transform
  * engine.
  *
  * The generic entry points (`latestState`, `scd2`, `snapshotDiff`)
  * work over ANY changelog DataFrame — callers name the key/time/state
  * columns; the q-methods are the driver-contract facades binding them
  * to the events table.
  *
  * Scale notes (100 TB): `latestState` and `snapshotDiff` are single
  * hash aggregations with map-side partial `max_by` — every map task
  * reduces to one row per key BEFORE the exchange, so the shuffle
  * carries O(keys), not O(changes). `scd2` shuffles ONCE on the entity
  * key; run detection, run aggregation and interval chaining are all
  * window passes over that same hash partitioning (Spark's
  * ClusteredDistribution is satisfied by the user-level exchange for
  * the (user, version) windows too — no second exchange; spec-pinned).
  */
object Changes {

  /** Microsecond epoch for an ISO date literal — exact long arithmetic,
    * timezone-free (mirrored as a plain literal in the DuckDB oracles). */
  def epochUs(isoDate: String): Long =
    java.time.LocalDate.parse(isoDate).toEpochDay * 86400000000L

  /** CDC latest-state compaction (upsert apply): one row per key with
    * the most recent change's payload, ordered by (tsUs, seq) with the
    * exact struct tie-break. Changes whose latest op is the tombstone
    * are dropped — the key no longer exists. Single aggregation; the
    * partial max_by makes the shuffle O(keys). */
  def latestState(changes: DataFrame, key: String, tsUs: Column, seq: String,
                  op: String, payload: Column, tombstone: String): DataFrame =
    changes
      .withColumn("ts_us", tsUs)
      .groupBy(col(key))
      .agg(
        max_by(struct(col(op).as("op"), payload.as("payload"), col("ts_us")),
               struct(col("ts_us"), col(seq))).as("last"),
        count(lit(1)).as("n_changes"))
      .filter(col("last.op") =!= tombstone)
      .select(col(key), col("last.op").as("last_type"),
        col("last.payload").as("last_value_cents"),
        col("last.ts_us").as("last_ts_us"), col("n_changes"))

  /** MERGE semantics (the lakehouse MERGE INTO row contract): apply a
    * keyed change batch — op ∈ {upsert, delete} — to a snapshot.
    * Matched upserts replace the payload, matched deletes drop the
    * row, unmatched upserts insert, unmatched deletes are no-ops, and
    * untouched target rows pass through. One full-outer join on the
    * key; the change batch is typically day-sized against a corpus
    * snapshot, so it broadcasts and the target never re-shuffles. The
    * STORAGE face — rewriting only the files that contain matched
    * keys — is VersionedStore.mergeCommit, which drives this same
    * row contract over the affected-file subset. `changes` must carry
    * the key, the op column, and the target's payload columns.
    *
    * The join is only correct with ONE change row per key. When `seq`
    * is given the batch is pre-reduced last-wins by (seq) — the CDC
    * micro-batch convention. When it is not, a duplicate key raises at
    * execution (the Delta/Iceberg MERGE multiple-matches error) instead
    * of silently fanning duplicate key rows into the snapshot. */
  def mergeChanges(target: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op", seq: Option[String] = None): DataFrame = {
    val payload = target.columns.filter(_ != key).toSeq
    val oneRow = seq match {
      case Some(sq) =>
        // a tied (key, seq) pair is ambiguous — max_by would pick a
        // NONDETERMINISTIC winner on ties, the exact hazard the no-seq
        // path raises on. Fold the tie check into the seq column the
        // reduce reads (same lazy-guard shape as below).
        val w = Window.partitionBy(col(key), col(sq))
        val guarded = changes.withColumn(sq,
          when(count(lit(1)).over(w) > 1, raise_error(concat(
            lit("mergeChanges: tied sequence values for key "),
            col(key).cast("string")))).otherwise(col(sq)))
        val rest = changes.columns.filter(_ != key).toSeq
        guarded.groupBy(col(key))
          .agg(max_by(struct(rest.map(col): _*), col(sq)).as("_last"))
          .select(col(key) +: rest.map(c => col(s"_last.$c").as(c)): _*)
      case None =>
        // lazy guard: fold the duplicate check into the op column (a
        // column the merge reads, so pruning cannot drop the check)
        val w = Window.partitionBy(col(key))
        changes
          .withColumn(opCol,
            when(count(lit(1)).over(w) > 1, raise_error(concat(
              lit("mergeChanges: multiple change rows for key "),
              col(key).cast("string")))).otherwise(col(opCol)))
    }
    target.as("t")
      .join(oneRow.as("c"), col(s"t.$key") === col(s"c.$key"), "full_outer")
      .where(coalesce(col(s"c.$opCol"), lit("keep")) =!= lit("delete"))
      .select(coalesce(col(s"c.$key"), col(s"t.$key")).as(key) +:
        payload.map(p =>
          when(col(s"c.$key").isNotNull, col(s"c.$p"))
            .otherwise(col(s"t.$p")).as(p)): _*)
  }

  /** q227's deterministic CDC batch over the customer snapshot:
    * custkey ≡ 0 (mod 11) → delete; else ≡ 0 (mod 7) → balance upsert
    * (+$123.45); plus inserts at key+10⁷ for custkey ≡ 0 (mod 13)
    * (mirrored literally in the oracle). */
  private def customerChanges(cust: DataFrame): DataFrame = {
    val upserts = cust.filter(col("c_custkey") % 11 === 0 ||
        col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 11 === 0, lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        col("c_name"),
        (col("acctbal_cents") + 12345L).as("acctbal_cents"),
        col("c_mktsegment"))
    val inserts = cust.filter(col("c_custkey") % 13 === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        lit("upsert").as("op"),
        concat(lit("Customer#new"), col("c_custkey")).as("c_name"),
        col("c_custkey").as("acctbal_cents"),
        lit("NEW").as("c_mktsegment"))
    upserts.unionByName(inserts)
  }

  /** q227: MERGE a deterministic CDC batch into the customer snapshot
    * (balances in exact cents) — the row-semantics face; the
    * copy-on-write storage face is spec-pinned in SourcesSpec. */
  def q227(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
      cents(col("c_acctbal")).as("acctbal_cents"), col("c_mktsegment"))
    mergeChanges(cust, customerChanges(cust), "c_custkey")
  }

  /** q115: the events table as a changelog — latest event per user
    * (type + value + time), 'error' as the tombstone op. */
  def q115(s: SparkSession, d: String): DataFrame =
    latestState(Tables.events(s, d), "user_id", micros(col("ts")), "event_id",
      "event_type", cents(col("value")), tombstone = "error")

  /** SCD-type-2 reconstruction: compress the change stream into runs of
    * constant `state` per key and emit one validity interval per run —
    * (key, version, state, valid_from, valid_to, n_events), valid_to
    * null on the current run. The half-open intervals [from, to) tile
    * each key's timeline exactly.
    *
    * One shuffle total: every window below partitions by `key` or
    * (key, version) — the single hash exchange on `key` satisfies both
    * distributions, so run detection (lag), run aggregation (min/count
    * over the run partition) and interval chaining (lead) are sorts
    * within the same partitioning. */
  def scd2(changes: DataFrame, key: String, tsUs: Column, seq: String,
           state: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col("ts_us").asc, col(seq).asc)
    val run   = Window.partitionBy(col(key), col("version"))
    val chain = Window.partitionBy(col(key)).orderBy(col("version").asc)
    changes
      .withColumn("ts_us", tsUs)
      .withColumn("is_change",
        when(lag(col(state), 1).over(byKey).isNull ||
             lag(col(state), 1).over(byKey) =!= col(state), 1L).otherwise(0L))
      .withColumn("version", sum(col("is_change")).over(byKey))
      .withColumn("n_events", count(lit(1)).over(run))
      // the run's first row IS the interval row: its ts is valid_from
      .filter(col("is_change") === 1L)
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(chain))
      .select(col(key), col("version"), col(state).as("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"), col("n_events"))
  }

  /** q116: SCD2 intervals of each user's event_type state. */
  def q116(s: SparkSession, d: String): DataFrame =
    scd2(Tables.events(s, d), "user_id", micros(col("ts")), "event_id", "event_type")

  /** Key-level diff of two snapshots of a changelog-derived state: for
    * each key, the latest `state` as of snapshot A (changes before
    * `oldEndUs`) vs snapshot B (changes at/after `newStartUs`), classed
    * added / removed / changed / same. ONE scan and ONE aggregation:
    * both snapshots come out of the same pass via FILTERed max_by —
    * no self-join, no second read of the change stream. */
  def snapshotDiff(changes: DataFrame, key: String, tsUs: Column, seq: String,
                   state: String, oldEndUs: Long, newStartUs: Long): DataFrame =
    changes
      .withColumn("ts_us", tsUs)
      .groupBy(col(key))
      .agg(
        // max_by skips rows whose ordering key is null — the `when`
        // null-out is the Column-API spelling of FILTER (WHERE ...)
        max_by(struct(col(state)),
          when(col("ts_us") < oldEndUs, struct(col("ts_us"), col(seq)))).as("o"),
        max_by(struct(col(state)),
          when(col("ts_us") >= newStartUs, struct(col("ts_us"), col(seq)))).as("n"))
      .select(col(key),
        when(col("o").isNull, "added")
          .when(col("n").isNull, "removed")
          .when(col("o") =!= col("n"), "changed")
          .otherwise("same").as("status"),
        col(s"o.$state").as("old_type"), col(s"n.$state").as("new_type"))

  /** q121: sliding-snapshot diff of each user's latest event_type —
    * old = events before Jan 22, new = events from Jan 8 on. */
  def q121(s: SparkSession, d: String): DataFrame =
    snapshotDiff(Tables.events(s, d), "user_id", micros(col("ts")), "event_id",
      "event_type", oldEndUs = epochUs("2024-01-22"), newStartUs = epochUs("2024-01-08"))

  /** TEMPORAL (point-in-time) join: enrich each probe row with the SCD2
    * interval version valid at its probe time — the "what was this
    * entity's state back then" lookup every audit/feature-backfill
    * pipeline needs. Because a key's intervals TILE its timeline
    * (scd2's invariant), containment in [valid_from, valid_to) is
    * exactly the backward as-of match on valid_from — so the lookup
    * rides the native AsOfJoinExec (one shuffle per side, per-partition
    * two-pointer merge), never an interval/range join (whose non-equi
    * condition degrades to per-key quadratic probing). LEFT OUTER:
    * probes before a key's first interval survive with nulls. The
    * interval's state/attributes re-attach by (key, version) equi-join
    * — version is unique per key, so the join adds no fan-out. */
  def temporalJoin(probe: DataFrame, probeKey: String, probeId: String,
                   probeTsUs: Column, intervals: DataFrame,
                   intervalKey: String): DataFrame = {
    val p = probe.select(col(probeId), col(probeKey).as("k_"),
      probeTsUs.as("probe_us"))
    val iv = intervals.select(col(intervalKey).as("k_"),
      col("valid_from_us"), col("version"), col("state"))
    graft.plans.AsOfJoin(p, "k_", "probe_us",
        iv.select(col("k_"), col("valid_from_us"), col("version")),
        "k_", "valid_from_us", "version", outer = true)
      .join(iv.select(col("k_"), col("version").as("asof_tie"), col("state")),
        Seq("k_", "asof_tie"), "left_outer")
      .select(col(probeId), col("k_").as(probeKey), col("probe_us"),
        col("asof_tie").as("version"), col("state").as("state_then"))
  }

  /** q125: each event enriched with the user's SCD2 state one hour
    * earlier (events inside the first hour keep nulls). */
  def q125(s: SparkSession, d: String): DataFrame =
    temporalJoin(
      Tables.events(s, d), "user_id", "event_id",
      micros(col("ts")) - lit(3600000000L),
      q116(s, d), "user_id")

  /** INCREMENTAL aggregate maintenance: merge a new batch's partial
    * aggregate into a previously materialized one without recomputing
    * history — new = base ⟗ delta with count/sum addition. Sound only
    * because the addends are EXACT (per-row cents quantized before any
    * sum): floating sums don't re-associate, so a maintainable
    * aggregate must discretize at the row, not at the merge (the same
    * discipline Cols.fixed applies at the oracle boundary). The merge
    * touches O(|delta| + |affected keys|) — the point of maintenance:
    * history is never rescanned. */
  def mergeAggregates(base: DataFrame, delta: DataFrame, key: String,
                      sumCols: Seq[String]): DataFrame =
    base.join(delta.select(col(key) +: sumCols.map(c => col(c).as(s"${c}_d")): _*),
        Seq(key), "full_outer")
      .select(col(key) +: sumCols.map(c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"${c}_d"), lit(0L))).as(c)): _*)

  /** Per-key order aggregate with row-level cents (the maintainable
    * form). */
  private def orderAgg(df: DataFrame): DataFrame =
    df.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           sum(cents(col("o_totalprice"))).as("sum_cents"))

  /** q137: maintain the per-customer order aggregate across a batch
    * boundary (orders before/after 2000-01-01) — the oracle recomputes
    * from scratch, so the hash match IS the maintenance identity. */
  def q137(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("2000-01-01").cast("date")
    val orders = Tables.orders(s, d)
    mergeAggregates(
      orderAgg(orders.filter(col("o_orderdate") < cutoff)),
      orderAgg(orders.filter(col("o_orderdate") >= cutoff)),
      "o_custkey", Seq("n_orders", "sum_cents"))
  }

  /** COLUMN-STATS DRIFT between two generations of a table (split at a
    * date boundary): row count, key cardinality, category cardinality,
    * value bounds and total per side, reported as per-metric
    * (old, new, delta) rows — the data-quality monitor that catches
    * silent upstream shifts (a vanished status code, a price-scale
    * change, a cardinality explosion) before they poison downstream
    * aggregates.
    *
    * Scale (100 TB): ONE conditional-aggregation scan computes both
    * sides' profiles — no self-join of the table against its other
    * half, no second pass; distinct cardinalities ride the same hash
    * aggregate. The per-metric report is a constant-width `stack`
    * unpivot of that single aggregated row. Values are exact longs
    * (prices in cents) so drift deltas are engine-stable. */
  def schemaDrift(orders: DataFrame, boundary: Column): DataFrame = {
    val agg = orders
      .select(
        (col("o_orderdate") >= boundary).as("is_new"),
        col("o_custkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_c"))
      .agg(
        count(when(!col("is_new"), 1)).as("rows_old"),
        count(when(col("is_new"), 1)).as("rows_new"),
        count_distinct(when(!col("is_new"), col("o_custkey"))).as("cust_old"),
        count_distinct(when(col("is_new"), col("o_custkey"))).as("cust_new"),
        count_distinct(when(!col("is_new"), col("o_orderstatus"))).as("stat_old"),
        count_distinct(when(col("is_new"), col("o_orderstatus"))).as("stat_new"),
        min(when(!col("is_new"), col("price_c"))).as("minp_old"),
        min(when(col("is_new"), col("price_c"))).as("minp_new"),
        max(when(!col("is_new"), col("price_c"))).as("maxp_old"),
        max(when(col("is_new"), col("price_c"))).as("maxp_new"),
        sum(when(!col("is_new"), col("price_c"))).as("sump_old"),
        sum(when(col("is_new"), col("price_c"))).as("sump_new"))
    agg.select(expr(
        """stack(6,
             'n_rows',      rows_old, rows_new,
             'n_customers', cust_old, cust_new,
             'n_statuses',  stat_old, stat_new,
             'min_price_c', minp_old, minp_new,
             'max_price_c', maxp_old, maxp_new,
             'sum_price_c', sump_old, sump_new) AS (metric, old_value, new_value)"""))
      .select(col("metric"), col("old_value"), col("new_value"),
        (col("new_value") - col("old_value")).as("delta"))
  }

  /** q152: order-table profile drift across the 1998-07-01 boundary. */
  def q152(s: SparkSession, d: String): DataFrame =
    schemaDrift(Tables.orders(s, d), lit("1998-07-01").cast("date"))

  /** PER-FILE LAYOUT AUDIT — the compaction/z-order planning input:
    * per physical parquet file (via input_file_name), row count and
    * the min/max of the clustering key, plus the overlap flag (does
    * this file's key range intersect the previous file's, in
    * min-key order). A table whose files all overlap answers every
    * key-range query by reading EVERYTHING (zone maps prune nothing);
    * disjoint ranges are what the z-order writer (Sources) buys —
    * this operator is how you find out which state a table is in and
    * how much a rewrite would help. File identity is reported as the
    * min-key RANK (a total order: key minima are distinct when the
    * key is unique), keeping output engine-comparable.
    *
    * Scale: one scan with map-side per-file partials (input_file_name
    * is free); the rank/overlap window runs over FILE-count rows —
    * bounded by the table's file inventory, never its rows. */
  def fileAudit(df: DataFrame, key: Column, layout: String): DataFrame = {
    val per = df.select(input_file_name().as("f"), key.as("k"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n_rows"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
    val w = Window.orderBy(col("min_key").asc)
    per
      .withColumn("file_rank", row_number().over(w).cast("long"))
      .withColumn("overlaps_prev",
        coalesce((col("min_key") <= lag(col("max_key"), 1).over(w))
          .cast("int"), lit(0)))
      .select(lit(layout).as("layout"), col("file_rank"), col("n_rows"),
        col("min_key"), col("max_key"), col("overlaps_prev"))
  }

  /** q304: the audit over two self-written layouts of the events ids —
    * hash-bucketed (every file spans the whole key range: all overlap,
    * zone maps useless) vs range-bucketed (disjoint: zone maps prune).
    * Written once per (app, dataset) with ONE file per bucket (the
    * repartition-by-bucket + partitionBy discipline), so per-file
    * stats equal per-bucket stats and the oracle derives them from
    * the ids directly. */
  def q304(s: SparkSession, d: String): DataFrame = {
    import graft.functions.F
    val root = Scratch.dir(s, d, "fileaudit")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // gate on the LAST layout's _SUCCESS marker (loadedMerges rule):
    // the hash dir exists as soon as its write STARTS, so probing it
    // would let a crashed first build poison the artifact forever
    if (!fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/range/_SUCCESS"))) {
      val ids = Tables.events(s, d).select(col("event_id"))
      ids.withColumn("bucket", pmod(col("event_id"), lit(8L)))
        .repartition(8, col("bucket"))
        .write.partitionBy("bucket").mode("overwrite").parquet(s"$root/hash")
      ids.withColumn("bucket", F.idiv(col("event_id"), lit(2000L)))
        .repartition(8, col("bucket"))
        .write.partitionBy("bucket").mode("overwrite").parquet(s"$root/range")
    }
    fileAudit(s.read.parquet(s"$root/hash"), col("event_id"), "hash")
      .unionAll(
        fileAudit(s.read.parquet(s"$root/range"), col("event_id"), "range"))
  }

  /** q299: INCREMENTAL CONSUMPTION through the versioned store — the
    * downstream-ETL cycle as a query: the standing store commits the
    * even-id half of the events ledger as v1, appends the odd half as
    * v2; a consumer checkpointed at v1 reads ONLY the increment
    * (VersionedStore.readAddedSince — planned from the manifests,
    * zero data reads to plan, the scan touches only v2's files) and
    * aggregates it per event type. The oracle recomputes the same
    * aggregate over the odd half directly — row-identical because
    * append increments are EXACT (file-level CDF, q227's storage
    * face). Store built once per (app, dataset) — the q175/q244
    * standing-artifact discipline. */
  def q299(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedStore
    import org.apache.hadoop.fs.Path
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val root = Scratch.dir(s, d, "incrstore")
    // crash-safe build: a _READY marker lands only after BOTH commits
    // (the loadedMerges discipline) — a run that died between v1 and
    // v2 leaves a torn store that must be rebuilt, not trusted (the
    // latestVersion==0 guard alone would skip forever and the
    // increment would read empty)
    val ready = new Path(s"$root/_READY")
    val fs = ready.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(ready)) {
      fs.delete(new Path(root), true)
      VersionedStore.commit(ev.filter(col("event_id") % 2 === 0), root,
        overwrite = true)
      VersionedStore.commit(ev.filter(col("event_id") % 2 === 1), root,
        overwrite = false)
      fs.create(ready, true).close()
    }
    VersionedStore.readAddedSince(s, root, 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(cents(col("value"))).as("sum_cents"))
  }
}

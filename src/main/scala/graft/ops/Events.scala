package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols._

/** Time-series / event operators: tumbling windows, gap sessionization,
  * top-k per group, as-of join, JSON property extraction.
  *
  * Scale notes (100 TB): every operator here shuffles AT MOST ONCE, on
  * the entity key (user_id), then does all per-entity work inside the
  * partition via window functions — no cross-partition state, no
  * driver-side iteration. The as-of join is the union-merge formulation
  * (one shuffle of both sides on the key, one in-partition sort) rather
  * than an events×orders range join, so it stays linear at scale.
  */
object Events {

  /** q30: event-time tumbling window (1h) aggregate per event type.
    * Map-side partial agg; output key is (hour bucket, type). */
  def q30(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           cents(sum(col("value"))).as("sum_value"),
           cents(avg(col("value"))).as("avg_value"))

  /** q31: gap-based sessionization (30-min inactivity gap).
    * Single shuffle on user_id; lag + running-sum inside the partition.
    * Session bounds exported as exact integer microseconds. */
  def q31(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_us")).as("session_start_us"),
           max(col("ts_us")).as("session_end_us"),
           count(lit(1)).as("n_events"),
           cents(sum(col("value"))).as("sum_value"))
  }

  /** q32: top-3 events per user by value (deterministic tie-break on
    * event_id). row_number inside the user partition — the filter cuts
    * before any further shuffle, so output is k×users not all events. */
  def q32(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), cents(col("value")).as("value_c"),
              row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  /** q33: as-of (backward) join events→orders on user/time.
    *
    * Union-merge formulation: tag both sides, union, single shuffle on
    * the key, then `last(_, ignoreNulls)` over an ordered window carries
    * the most recent order forward onto each event row. Ties on order
    * date resolve to the greatest o_orderkey (rows sorted so that the
    * winning order is last before the event). This is one shuffle + one
    * sort regardless of how many orders precede each event — an
    * events×orders inequality join would be quadratic per key.
    * Matched events only (inner as-of). */
  def q33(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("user_id").as("k"), unix_micros(col("ts").cast("timestamp")).as("t_us"),
      lit(1).as("is_event"), col("event_id"),
      lit(null).cast("long").as("o_orderkey_in"), lit(null).cast("long").as("o_date_us_in"))
    val ord = Tables.orders(s, d).select(
      col("o_custkey").as("k"), unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
      lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("o_orderkey_in"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us_in"))
    // Order rows sort before event rows at equal t_us (is_event asc) and
    // among simultaneous orders the max o_orderkey comes last → `last`
    // picks exactly max(o_orderdate, o_orderkey) among orders ≤ ts.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t_us").asc, col("is_event").asc, col("o_orderkey_in").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("last_orderkey", last(col("o_orderkey_in"), ignoreNulls = true).over(w))
      .withColumn("last_order_us", last(col("o_date_us_in"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("last_orderkey").isNotNull)
      .select(col("event_id"), col("k").as("user_id"), col("t_us").as("ts_us"),
              col("last_orderkey"), col("last_order_us"))
  }

  /** q35: ordered funnel (view → click → purchase) — each stage's
    * timestamp must strictly follow the previous stage's first hit.
    * Three narrow joins on user_id (all broadcast-size after the first
    * stage filter at 100 TB, since funnels only narrow). */
  def q35(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v, "user_id").filter(col("t_us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c, "user_id").filter(col("t_us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("t_us")).as("t3"))
    v.agg(count(lit(1)).as("n_view")).crossJoin(
      c.agg(count(lit(1)).as("n_click"))).crossJoin(
      p.agg(count(lit(1)).as("n_purchase")))
  }

  /** q36: daily cohort retention — users active on the first day who
    * return on each of the next 7 days. One distinct-user shuffle per
    * side; the day-0 cohort broadcasts. */
  def q36(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val day0 = to_date(lit("2024-01-01"))
    val cohort = ev.filter(col("day") === day0).select(col("user_id")).distinct()
    ev.filter(datediff(col("day"), day0).between(1, 7))
      .join(broadcast(cohort), "user_id")
      .groupBy(datediff(col("day"), day0).as("day_n"))
      .agg(countDistinct(col("user_id")).as("n_retained"))
  }

  /** q37: frame-based rolling windows — per-user cumulative sum and a
    * 3-row moving sum/average over event time. Values are discretized to
    * integer cents BEFORE the window sums, so frame aggregation is exact
    * integer arithmetic — immune to the float-summation-order divergence
    * window engines otherwise exhibit (DuckDB's segment-tree frames
    * associate differently than Spark's running accumulator). One shuffle
    * on user_id; both frames evaluate in the same sorted partition. */
  def q37(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc, col("event_id").asc)
    val cum  = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = byUser.rowsBetween(-2, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("vc"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        sum(col("vc")).over(cum).as("cum_value_c"),
        sum(col("vc")).over(last3).as("sum3_c"),
        count(lit(1)).over(last3).as("n3"))
      .withColumn("avg3_c", floor(col("sum3_c").cast("double") / col("n3")).cast("long"))
  }

  /** q38: fixed-width histogram/binning of order totals — bucket =
    * floor(price / 10000). Purely map-side until the (tiny) per-bucket
    * aggregation; the canonical distribution-profiling shape. */
  def q38(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 10000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
           cents(sum(col("o_totalprice"))).as("sum_price"),
           cents(min(col("o_totalprice"))).as("min_price"),
           cents(max(col("o_totalprice"))).as("max_price"))

  /** q39: range join — co-occurring event-type pairs from the same user
    * within 5 minutes (b in [a, a+5min], a ≠ b). A raw theta join
    * (BETWEEN on time) degenerates to a per-key nested loop; the scale
    * shape is a BUCKETED equi-join: the left side explodes each event
    * into the two 5-minute buckets its window can touch, the right side
    * keeps its single bucket, and the join runs on (user_id, bucket)
    * with the range as a residual filter. Bucket width = range width,
    * so left fan-out is exactly 2× and every qualifying pair matches
    * exactly once (the right event's bucket is unique). */
  def q39(s: SparkSession, d: String): DataFrame = {
    val windowUs = 5L * 60 * 1000000
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val a = ev.select(col("user_id"),
      col("event_id").as("id_a"), col("event_type").as("type_a"),
      col("us").as("us_a"),
      explode(array(expr(s"us div $windowUs"), expr(s"us div $windowUs") + 1)).as("bucket"))
    val b = ev.select(col("user_id"),
      col("event_id").as("id_b"), col("event_type").as("type_b"),
      col("us").as("us_b"), expr(s"us div $windowUs").as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("id_a") =!= col("id_b") &&
        col("us_b") >= col("us_a") && col("us_b") <= col("us_a") + windowUs)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("user_id")).as("n_users"))
  }

  /** q34: JSON property extraction + aggregate over the extracted field. */
  def q34(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           cents(avg(col("k"))).as("avg_k"),
           countDistinct(col("k")).as("n_distinct_k"),
           count(lit(1)).as("cnt"))
}

package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col
import graft.Tables

/** Typed Dataset[T] surface: case-class views over the star schema and
  * a typed Aggregator, for pipelines where compile-time row types catch
  * schema drift. The typed API plans through the same Catalyst pipeline
  * — groupByKey(_.field) is a hash shuffle on the key and Aggregator
  * gets map-side partial aggregation exactly like a built-in aggregate
  * (reduce on each map task, merge after the exchange) — so type safety
  * costs nothing at 100 TB. Deserialization to case classes happens
  * once at the operator boundary, not per expression.
  */
object Typed {

  case class LineItem(l_orderkey: Long, l_returnflag: String,
                      l_quantity: Double, l_extendedprice: Double,
                      l_discount: Double)

  case class RevenueStats(n: Long, quantity: Double, revenue: Double)

  def lineitems(s: SparkSession, d: String): Dataset[LineItem] = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .as[LineItem]
  }

  /** Typed revenue aggregator: partial-aggregates map-side via
    * reduce/merge, like any built-in aggregate. */
  val revenueAgg: Aggregator[LineItem, RevenueStats, RevenueStats] =
    new Aggregator[LineItem, RevenueStats, RevenueStats] {
      override def zero: RevenueStats = RevenueStats(0L, 0.0, 0.0)
      override def reduce(b: RevenueStats, r: LineItem): RevenueStats =
        RevenueStats(b.n + 1, b.quantity + r.l_quantity,
          b.revenue + r.l_extendedprice * (1.0 - r.l_discount))
      override def merge(a: RevenueStats, b: RevenueStats): RevenueStats =
        RevenueStats(a.n + b.n, a.quantity + b.quantity, a.revenue + b.revenue)
      override def finish(r: RevenueStats): RevenueStats = r
      override def bufferEncoder: Encoder[RevenueStats] = Encoders.product[RevenueStats]
      override def outputEncoder: Encoder[RevenueStats] = Encoders.product[RevenueStats]
    }

  /** Revenue stats per return flag, fully typed end to end. */
  def revenueByFlag(ds: Dataset[LineItem]): Dataset[(String, RevenueStats)] = {
    implicit val tupleEnc: Encoder[(String, RevenueStats)] =
      Encoders.tuple(Encoders.STRING, Encoders.product[RevenueStats])
    ds.groupByKey(_.l_returnflag)(Encoders.STRING)
      .agg(revenueAgg.toColumn)
  }
}

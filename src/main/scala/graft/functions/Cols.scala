package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared across operators.
  *
  * Float discipline: any double that crosses the correctness oracle is
  * discretized with `fixed` — floor(x * scale + 0.5) as BIGINT — instead
  * of engine `round()`. Spark's `round` re-interprets doubles through
  * their shortest decimal string (BigDecimal.valueOf) while DuckDB rounds
  * the binary value, so the two disagree on exact-looking halves like
  * 2.675. Pure floor/multiply arithmetic is bit-identical across engines
  * given the same input double.
  */
object Cols {
  /** floor(c * scale + 0.5) as long — cross-engine-stable fixed-point. */
  def fixed(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Money in cents (2 implied decimals). */
  def cents(c: Column): Column = fixed(c, 100L)

  /** 4-decimal fixed point (ratios, similarities). */
  def bp(c: Column): Column = fixed(c, 10000L)

  /** Event-time as exact integer microseconds (cross-engine-safe). */
  def micros(c: Column): Column = unix_micros(c)

  /** SQL fragment mirrors for DuckDB oracles. */
  def sqlFixed(expr: String, scale: Long): String =
    s"CAST(floor(($expr) * $scale + 0.5) AS BIGINT)"
  def sqlCents(expr: String): String = sqlFixed(expr, 100L)
  def sqlBp(expr: String): String    = sqlFixed(expr, 10000L)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 moved Column↔Expression conversion behind
  * `private[sql]` (`classic.ExpressionUtils`), so extension libraries
  * expose it via a same-package object — the standard pattern for
  * Spark-native libraries shipping their own expressions.
  */
object GraftColumns {
  def wrap(e: Expression): Column = ExpressionUtils.column(e)
  def unwrap(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (classic.Dataset.ofRows is
    * private[sql]; same-package bridge, as with Column conversion). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, HammingDistance64, RollingHash64}

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works too.
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[HammingDistance64].getName, "hamming64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingDistance64(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
  }
}

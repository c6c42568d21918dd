package graft

import org.apache.spark.sql.functions._
import graft.functions.F

/** Native expression correctness — interpreted vs codegen paths, and SQL
  * registration through GraftExtensions. */
class ExpressionsSpec extends SparkSpec {
  import SparkTestSession.spark.implicits._

  test("rollingHash64 matches the reference recurrence and is deterministic") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(1125899906842597L)((h, b) => h * 31L + (b & 0xff))
    val rows = Seq("", "a", "hello world", "über-ascii ✓").toDF("s")
      .select(col("s"), F.rollingHash64(col("s")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
  }

  test("hamming64 counts differing bits") {
    val got = Seq((0L, -1L), (5L, 4L), (Long.MinValue, 0L))
      .toDF("a", "b").select(F.hamming64(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == Seq(64, 1, 1))
  }

  test("cosineSim matches a sequential double computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    def seq(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      x.indices.foreach { i =>
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(F.cosineSim(col("a"), col("b"))).as[Double].head()
    assert(got == seq(a, b))
  }

  test("extensions register SQL functions (cosine_sim, hamming64, rolling_hash64)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c, " +
      "hamming64(1L, 3L) AS h, rolling_hash64('x') AS f").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 1)
  }
}

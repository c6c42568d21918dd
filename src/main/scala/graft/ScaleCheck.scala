package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale cross-checks: re-validates the correctness-critical equalities
  * the specs pin at sf0.001 — at whatever scale factor is given
  * (`runMain graft.ScaleCheck /root/testdata/sf0.1`). These are the
  * claims that COULD silently degrade with data volume (LSH recall,
  * perceptual-hash recall, salted-join equality), as opposed to the
  * oracle checks, which the driver already runs per scale. */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. MinHash-LSH pair set == exact-Jaccard pair set (the banded-LSH
    // miss probability claim: ~2e-11 per 0.97-similar pair).
    val lsh = ops.Dedup.q52(spark, sfDir).select("doc_a", "doc_b")
    val exact = ops.Dedup.q51(spark, sfDir).select("doc_a", "doc_b")
    val lshMiss = exact.exceptAll(lsh).count()
    val lshExtra = lsh.exceptAll(exact).count()
    println(s"CHECK lsh_vs_exact missed=$lshMiss extra=$lshExtra " +
      s"(total=${exact.count()})")

    // 2. Perceptual image dedup: planted-copy recall + false-pair count.
    val pairs = ops.Multimodal.q124(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    val planted = pairs
      .filter(col("doc_b") - col("doc_a") === ops.Multimodal.CopyOffset).count()
    val falsePairs = pairs.count() - planted
    println(s"CHECK image_dedup planted=$planted/$nDocs false=$falsePairs")
    pairs.unpersist()

    // 3. Salted join equals the plain (unsalted) join — skew mitigation
    // must not change results at any volume.
    val salted = ops.Relational.q29(spark, sfDir)
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(graft.functions.Cols.cents(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("cnt"))
    val saltDiff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    println(s"CHECK salted_join diff_rows=$saltDiff")

    // 4. Incremental dedup (odd batch vs even-id store) == whole-corpus
    // pairs touching an odd doc (cross-run soundness).
    val incr = ops.Dedup.q88(spark, sfDir).select("doc_a", "doc_b")
    val whole = ops.Dedup.q52(spark, sfDir).select("doc_a", "doc_b")
      .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
    val incrDiff = incr.exceptAll(whole).count() + whole.exceptAll(incr).count()
    println(s"CHECK incremental_dedup diff_rows=$incrDiff")

    // 5. ANN recall@10 vs the exact brute force at this scale (the
    // specs pin ≥0.90 / ≥0.85 at sf0.001; quantizer quality and cell
    // balance shift with corpus size).
    val truth = ops.Similarity.q60(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = truth.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      hit.toDouble / truth.count()
    }
    println(f"CHECK ann_recall ivf=${recall(ops.Similarity.q62(spark, sfDir))}%.3f " +
      f"pq=${recall(ops.Similarity.q63(spark, sfDir))}%.3f " +
      f"lsh=${recall(ops.Similarity.q61(spark, sfDir))}%.3f")

    spark.stop()
  }
}

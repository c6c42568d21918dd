package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 diagnostic for the sf1 graph-ANN recall collapse: vary the
  * walk budget and the seeding against one NN-Descent graph to
  * separate "the graph is bad" from "the walk can't reach". */
object DiagAnn {
  /** Round-16 sub-diagnostic for the clustered-corpus recall collapse:
    * `runMain graft.DiagAnn truthsplit <factor>` amplifies sf0.1
    * through ScaleGen.amplifyClustered and prints, per query, which
    * REPLICA GROUP its exact top-10 lives in — separating "the truth
    * crosses isometric replica groups" (a build/connectivity problem:
    * cross-group cosines never make a node's top-M, so NN-Descent
    * leaves the groups disconnected and no walk budget can cross)
    * from "the walk is too small". */
  private def truthSplit(spark: SparkSession, factor: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-diag-truth").toString
    ScaleGen.amplifyClustered(spark, "/root/testdata/sf0.1", factor)
      .write.mode("overwrite").parquet(s"$dir/emb")
    val c = spark.read.parquet(s"$dir/emb")
    val q = c.filter(col("vec_id") < ops.Similarity.NumQueries)
    val truth = ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
    // replica index r = vec_id / ScaleGen.Stride; cluster = r % 32
    val rep = truth.select(col("query_id"),
      (col("neighbor_id") / ScaleGen.Stride).cast("long").as("r"))
    rep.groupBy(col("query_id"), col("r")).count()
      .orderBy(col("query_id"), col("r"))
      .collect().foreach(x => println(
        s"query=${x.getLong(0)} replica=${x.getLong(1)} n=${x.getLong(2)}"))
    val byR = rep.groupBy(col("r")).count().orderBy(col("r")).collect()
    byR.foreach(x => println(s"TOTAL replica=${x.getLong(0)} n=${x.getLong(1)}"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("truthsplit")) {
      truthSplit(spark, if (args.length > 1) args(1).toInt else 50)
      spark.stop(); return
    }
    val (c, q) = ops.Similarity.corpusAndQueries(spark, sfDir)
    println(s"corpus n=${c.count()}")
    val truth = ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding")
      .select(col("query_id"), col("neighbor_id")).cache()
    val tn = truth.count()
    def recall(a: org.apache.spark.sql.DataFrame): Double =
      truth.join(a.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / tn
    val g = ops.Similarity.nnDescentGraph(c, "vec_id", "embedding",
      m = 32, rounds = 8).localCheckpoint()
    val rg = recall(ops.Similarity.nswSearchTopK(g, c, q,
      "vec_id", "embedding", beam = 64, hops = 6))
    println(f"graph M=32 r=8 b=64 h=6: recall=$rg%.3f")
    val rerank = ops.Similarity.corpusScaledRerank(c)
    for (probes <- Seq(22, 26, 30)) {
      val r = recall(ops.Similarity.ivfPqTopK(c, q, "vec_id", "embedding",
        probes = probes, rerank = rerank))
      println(f"ivfpq probes=$probes%2d: recall=$r%.3f")
    }
    val hnswDir = java.nio.file.Files
      .createTempDirectory("graft-diag-hnsw").toString + "/idx"
    ops.Similarity.writeHnswIndex(c, "vec_id", "embedding", hnswDir,
      m = 32, rounds = 8)
    for (hops0 <- Seq(2, 3)) {
      val r = recall(ops.Similarity.hnswTopKFromIndex(spark, hnswDir, q,
        "vec_id", "embedding", beam = 64, hops0 = hops0))
      println(f"hnsw M=32 r=8 b=64 hops0=$hops0: recall=$r%.3f")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 diagnostic for the sf1 graph-ANN recall collapse: vary the
  * walk budget and the seeding against one NN-Descent graph to
  * separate "the graph is bad" from "the walk can't reach". */
object DiagAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third-decade ANN recall measurement (round 14; VERDICT r13 item 4):
  * the scaled-construction rule was derived from a one-decade collapse
  * (r12: fixed params 0.08 @ 20k) and re-measured at 2k/20k in r13 —
  * this runner extends the evidence one decade further. It amplifies
  * the sf0.1 embeddings by `factor` (default 100 → ~200k vectors;
  * ScaleGen's isometric replicas, rotation ∘ wrap-band negation so no
  * replica duplicates another), builds the DEFAULT (scale-adapted,
  * manifest-pinned) graph and HNSW stores, and reports serve-path
  * recall@10 against the exact brute force for the NumQueries original
  * queries. IVF-PQ rides along through its own scaled training.
  *
  * Usage: runMain graft.AnnDecade [factor] — prints one JSON line per
  * index family; exits non-zero if the DEFAULT graph path slips below
  * 0.9 (the SCALECHECK convention: a scripted run cannot record a
  * regressed invariant as validated). */
object AnnDecade {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-decade").toString
    // materialize the amplified corpus as parquet: three consumers
    // (truth, two builds) must not each re-run the 100-way union
    ScaleGen.amplify(spark, "/root/testdata/sf0.1", factor, "embeddings")
      .write.mode("overwrite").parquet(s"$dir/emb")
    val c = spark.read.parquet(s"$dir/emb")
    val n = c.count()
    val q = c.filter(col("vec_id") < ops.Similarity.NumQueries)
    val truth = ops.Similarity
      .bruteForceTopK(c, q, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.map { case (qid, t) =>
        got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val params = ops.Similarity.nswScaledParams(n)
    // DEFAULT graph store: build once, serve with the pinned budget
    val (_, buildS) = timed {
      ops.Similarity.writeNswIndex(c, "vec_id", "embedding", s"$dir/nsw")
    }
    val (nswRows, serveS) = timed {
      ops.Similarity.nswTopKFromIndex(spark, s"$dir/nsw", q,
        "vec_id", "embedding").collect()
    }
    val rNsw = recall(nswRows)
    println(f"""{"family":"graph_default","n":$n,"factor":$factor,""" +
      f""""params":"m=${params._1},rounds=${params._2},beam=${params._3},hops=${params._4}",""" +
      f""""build_s":$buildS%.1f,"serve_s":$serveS%.1f,"recall":$rNsw%.3f}""")
    // DEFAULT HNSW store (layered over the same scaled layer-0 rule)
    val (_, hBuildS) = timed {
      ops.Similarity.writeHnswIndex(c, "vec_id", "embedding", s"$dir/hnsw")
    }
    val (hRows, hServeS) = timed {
      ops.Similarity.hnswTopKFromIndex(spark, s"$dir/hnsw", q,
        "vec_id", "embedding").collect()
    }
    val rHnsw = recall(hRows)
    println(f"""{"family":"hnsw_default","n":$n,"factor":$factor,""" +
      f""""build_s":$hBuildS%.1f,"serve_s":$hServeS%.1f,"recall":$rHnsw%.3f}""")
    spark.stop()
    if (rNsw < 0.9) {
      System.err.println(
        f"DEFAULT graph recall $rNsw%.3f < 0.9 at n=$n — amend nswScaledParams")
      sys.exit(1)
    }
  }
}

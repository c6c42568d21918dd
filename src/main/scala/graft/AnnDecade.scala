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
  * Usage: runMain graft.AnnDecade [factor] [mode] [families] — prints
  * one JSON line per index family; exits non-zero if the DEFAULT
  * graph path slips below 0.9 (the SCALECHECK convention: a scripted
  * run cannot record a regressed invariant as validated).
  *
  * Round 15 (VERDICT r14 item 3):
  *  - `mode` = uniform (default) | clustered — clustered amplifies
  *    through ScaleGen.amplifyClustered (32 deterministic centers)
  *    and additionally serves the built graph store at a BEAM SWEEP
  *    (32/64/128/scaled), evidencing the "clustered corpora need far
  *    less beam" claim in nswScaledParams with numbers instead of an
  *    assertion. In clustered mode the <0.9 exit gate applies to the
  *    SCALED-beam row only (the narrow sweep points are the
  *    measurement, not an invariant).
  *  - `families` = both (default) | graph — graph skips the HNSW
  *    build, so the beam-CAP decade (~280k, where beam ≈ n/256 hits
  *    the 1024 cap) fits a wall-clock budget. */
object AnnDecade {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val mode = if (args.length > 1) args(1) else "uniform"
    val families = if (args.length > 2) args(2) else "both"
    require(Seq("uniform", "clustered").contains(mode), s"bad mode $mode")
    require(Seq("both", "graph").contains(families), s"bad families $families")
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
    (if (mode == "clustered")
       ScaleGen.amplifyClustered(spark, "/root/testdata/sf0.1", factor)
     else ScaleGen.amplify(spark, "/root/testdata/sf0.1", factor, "embeddings"))
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
    println(f"""{"family":"graph_default","mode":"$mode","n":$n,"factor":$factor,""" +
      f""""params":"m=${params._1},rounds=${params._2},beam=${params._3},hops=${params._4}",""" +
      f""""build_s":$buildS%.1f,"serve_s":$serveS%.1f,"recall":$rNsw%.3f}""")
    if (mode == "clustered") {
      // the beam-vs-recall curve on the SAME store: how much walk a
      // corpus with real neighborhood structure actually needs
      for (b <- Seq(32, 64, 128).filter(_ < params._3)) {
        val (rows, sS) = timed {
          ops.Similarity.nswTopKFromIndex(spark, s"$dir/nsw", q,
            "vec_id", "embedding", beam = b).collect()
        }
        val r = recall(rows)
        println(f"""{"family":"graph_beam_sweep","mode":"$mode","n":$n,""" +
          f""""beam":$b,"hops":${params._4},"serve_s":$sS%.1f,"recall":$r%.3f}""")
      }
    }
    if (families == "both") {
      // DEFAULT HNSW store (layered over the same scaled layer-0 rule)
      val (_, hBuildS) = timed {
        ops.Similarity.writeHnswIndex(c, "vec_id", "embedding", s"$dir/hnsw")
      }
      val (hRows, hServeS) = timed {
        ops.Similarity.hnswTopKFromIndex(spark, s"$dir/hnsw", q,
          "vec_id", "embedding").collect()
      }
      val rHnsw = recall(hRows)
      println(f"""{"family":"hnsw_default","mode":"$mode","n":$n,"factor":$factor,""" +
        f""""build_s":$hBuildS%.1f,"serve_s":$hServeS%.1f,"recall":$rHnsw%.3f}""")
    }
    spark.stop()
    if (rNsw < 0.9) {
      System.err.println(
        f"DEFAULT graph recall $rNsw%.3f < 0.9 at n=$n — amend nswScaledParams")
      sys.exit(1)
    }
  }
}

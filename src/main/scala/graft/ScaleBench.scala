package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-decade scaling evidence for the scale-sensitive operator family:
  * runs each query at two (or more) scale dirs — normally the driver's
  * sf0.1 and the ScaleGen-amplified sf1 — and records wall seconds,
  * result rows, and SHUFFLE WRITE volume per query, then prints a
  * ratio table. Because the amplified corpus is `factor` isomorphic
  * replicas (see ScaleGen), result-row counts for pair-producing
  * operators must grow EXACTLY factor-x (any extra rows are
  * cross-replica false candidates = super-linear pressure), and
  * shuffle bytes must grow ~factor-x (quadratic candidate generation
  * shows up here first). Wall time at these sizes is overhead-heavy,
  * so the row/shuffle ratios are the load-bearing signal; time is
  * reported for orientation.
  *
  * Usage: runMain graft.ScaleBench <dirA> <dirB> [factor]
  * Emits one JSON line per (dir, query) and a final RATIOS block.
  */
object ScaleBench {
  /** The family VERDICT r8 item 3 names: lexical near-dup, sparse
    * cosine, perceptual image dedup, graph/ER, ANN probes — plus the
    * corpus-shuffle text ops whose blocking could degrade. */
  val Family: Seq[String] = Seq(
    "q51_dedup_ngram_jaccard", "q52_dedup_minhash_lsh", "q53_dedup_simhash",
    "q89_dedup_containment", "q106_passage_dedup",
    "q113_sparse_cosine", "q124_image_dedup",
    "q135_dup_graph", "q136_entity_resolution",
    "q60_ann_bruteforce", "q61_ann_lsh", "q62_ann_ivf", "q63_ann_pq",
    "q114_semdedup", "q114_semdedup_scaledk",
    "q45_tfidf", "q160_bigram_surprisal",
    "q176_decontaminate",
    // round-9 session-2 additions: the wedge-join graph op (the one
    // with a genuinely super-linear failure mode), the five-way n-gram
    // join LM, map-only chunking, and dictionary-filtered phrase
    // alignment (fixed panel: replicas share no vocabulary with it)
    "q190_triangles", "q193_trigram_lm", "q191_chunk_windows",
    "q198_phrase_search")

  /** The contract queries plus scale-mode variants that are not
    * `SparkEntry.queries` members (their parameters adapt to corpus
    * size, which the static DuckDB oracles cannot express). */
  val queryMap: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    SparkEntry.queries ++ Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
      "q114_semdedup_scaledk" -> (ops.Similarity.q114Scaled _),
      "q250_ann_graph_scaledp" -> (ops.Similarity.q250Scaled _))

  private class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong
    val records = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.length >= 2) args.take(2).toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/scale/sf1")
    val factor = if (args.length > 2) args(2).toDouble else 10.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // dir -> query -> (secs, rows, shuffleBytes, shuffleRecords)
    val out = collection.mutable.Map
      .empty[(String, String), (Double, Long, Long, Long)]
    for (dir <- dirs; name <- Family) {
      val t0 = System.nanoTime()
      val rows = queryMap(name)(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let async stage-completed events drain
      val (b, r) = (meter.bytes.getAndSet(0L), meter.records.getAndSet(0L))
      out((dir, name)) = (secs, rows, b, r)
      println(f"""{"dir":"$dir","query":"$name","secs":$secs%.3f,"rows":$rows,"shuffle_bytes":$b,"shuffle_records":$r}""")
    }

    val (a, bDir) = (dirs(0), dirs(1))
    println("RATIOS (dirB / dirA; corpus factor = " + factor + ")")
    println(f"${"query"}%-26s ${"time_x"}%8s ${"rows_x"}%8s ${"shufB_x"}%8s ${"shufR_x"}%8s")
    var worstRows = 0.0; var worstShuf = 0.0
    for (name <- Family) {
      val (ta, ra, ba, sa) = out((a, name))
      val (tb, rb, bb, sb) = out((bDir, name))
      def ratio(x: Long, y: Long) = if (x == 0) 0.0 else y.toDouble / x
      val rx = ratio(ra, rb); val bx = ratio(ba, bb); val sx = ratio(sa, sb)
      worstRows = math.max(worstRows, rx); worstShuf = math.max(worstShuf, sx)
      println(f"$name%-26s ${tb / ta}%8.2f $rx%8.2f $bx%8.2f $sx%8.2f")
    }
    println(f"""SUMMARY {"worst_rows_ratio":$worstRows%.2f,"worst_shuffle_records_ratio":$worstShuf%.2f,"factor":$factor%.1f}""")
    spark.stop()
    // QUADRATIC gate, not a tight linearity gate: at factor-x data a
    // quadratic stage shows up as ~factor²-x (the unfixed q113
    // measured 2519x at factor 10). Two benign effects preclude a
    // 1.5x-factor bound: (a) plan flips at size thresholds (a verify
    // join whose small side stops broadcasting starts SHUFFLING its
    // payload — q89's 41x records are this, constant-factor beyond the
    // flip), and (b) token-hash-sensitive truth mass (simhash
    // signatures redraw per Caesar replica; the DuckDB-recomputed true
    // pair mass at sf1 is 33x, and q53's 32x shuffle tracks it
    // LINEARLY). Rows above 2.5x-factor or shuffle records above
    // 25x-factor cannot be explained by either and fail the run.
    if (worstRows > factor * 2.5 || worstShuf > factor * 25.0) {
      System.err.println("SUPER-LINEAR (quadratic-scale) growth detected")
      System.exit(1)
    }
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols._
import graft.functions.F

/** Similarity search over the embeddings table.
  *
  * Scale design (100 TB): the query set is small and broadcast, so the
  * scoring pass is map-side over the (huge) corpus — no corpus shuffle.
  * The only shuffle is the per-query top-k reduction, which moves
  * O(queries × corpus-partition-count × k) rows after partial pruning,
  * not the full score matrix. The LSH variant buckets the corpus once
  * (map-only signatures) and scores only same-bucket candidates.
  */
object Similarity {

  val TopK = 10
  val NumQueries = 10

  /** q60: exact brute-force top-k cosine neighbors for queries
    * (vec_id < NumQueries), self excluded. Tie-break: neighbor id asc. */
  def q60(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cos = F.cosineSim(col("q_emb"), col("embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), bp(col("cos")).as("cos_bp"))
  }

  // 16 small tables rather than 8 larger ones: the synthetic corpus is
  // near-uniform (top neighbors at ~70° angles), so per-table collision
  // probability is low and recall comes from the OR over tables.
  val LshTables = 16
  val LshBits = 6

  /** Deterministic ±1 hyperplane weights, one 64-bit sign mask per
    * (table, bit) hyperplane — fixed seed, no stored model. */
  val hyperplaneMasks: Seq[Long] = {
    val rnd = new scala.util.Random(0x677261667431L)
    Seq.fill(LshTables * LshBits)(rnd.nextLong())
  }

  /** q61: LSH-bucketed approximate top-k — 16 tables × 6 hyperplane
    * bits; candidates = same bucket in any table; exact cosine on
    * candidates only. All 96 sign projections run in ONE native codegen
    * expression pass per row (HyperplaneBuckets). */
  def q61(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    def withBuckets(idCol: String, embCol: String)(df: DataFrame): DataFrame =
      df.select(col(idCol), col(embCol),
        posexplode(F.hyperplaneBuckets(col(embCol), hyperplaneMasks, LshBits)).as(Seq("t", "bk")))
    val corpus = withBuckets("vec_id", "embedding")(
      e.select(col("vec_id"), col("embedding")))
    val queries = withBuckets("query_id", "q_emb")(
      e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val cos = F.cosineSim(col("q_emb"), col("embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    corpus.as("c").join(broadcast(queries.as("q")),
        col("c.t") === col("q.t") && col("c.bk") === col("q.bk") &&
        col("c.vec_id") =!= col("q.query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("q_emb"), col("embedding"))
      .distinct()
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), bp(col("cos")).as("cos_bp"))
  }

  val IvfCells = 16
  val IvfProbes = 4

  /** q62: IVF-Flat approximate top-k — a coarse quantizer of `IvfCells`
    * sampled corpus vectors partitions the corpus into inverted lists;
    * each query probes its `IvfProbes` nearest cells and scores only
    * those lists exactly.
    *
    * Scale design: the quantizer is a tiny model (16×64 floats) fetched
    * once to the driver — the one deliberate collect() in the library —
    * and re-broadcast as literals inside a single codegen'd projection,
    * so cell assignment is map-only over the corpus. The candidate join
    * shuffles on cell id (≈ corpus/IvfCells rows per query-probe), never
    * the full n×m score matrix. At 100 TB: more cells (√n), k-means-
    * refined centroids, same plan shape. */
  def q62(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val centroids: Seq[Seq[Float]] = e.orderBy(col("vec_id").asc).limit(IvfCells)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    // One struct per cell: (cos to centroid, cell id). Struct ordering is
    // (cos, id), so array_max = argmax with deterministic id tie-break.
    def cellScores(emb: Column): Column = array(centroids.zipWithIndex.map {
      case (c, i) => struct(F.cosineSim(emb, typedlit(c)).as("c"), lit(i).as("i"))
    }: _*)
    val corpus = e.select(col("vec_id"), col("embedding"),
      array_max(cellScores(col("embedding"))).getField("i").as("cell"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(transform(
          slice(reverse(sort_array(cellScores(col("embedding")))), 1, IvfProbes),
          x => x.getField("i"))).as("cell"))
    val cos = F.cosineSim(col("q_emb"), col("embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), bp(col("cos")).as("cos_bp"))
  }

  val PqM = 8        // subspaces (4-bit codes pack into one long)
  val PqK = 16       // centroids per subspace
  val PqRerank = 80  // ADC shortlist size fed to exact rerank

  /** q63: product-quantization ANN — the memory-bound scale path. The
    * corpus is compressed to ONE long per vector (8 × 4-bit subspace
    * codes): at 100 TB that's a 32× reduction over raw float32[64]
    * embeddings, so the scored table is a fraction of the source size.
    * Each query precomputes its ADC lookup table once (PqTable);
    * per-candidate scoring is then 8 array lookups (PqAdc), not a
    * 64-dim dot product. The ADC shortlist (top `PqRerank` per query)
    * is joined back to raw embeddings for exact cosine rerank — only
    * O(queries × PqRerank) full vectors are ever touched per query.
    *
    * The codebook is `PqK` sampled corpus vectors' subvectors (same
    * tiny-model-collect pattern as q62's coarse quantizer); at scale
    * it would be k-means-refined per subspace — same plan shape. */
  def q63(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    // codebook[sub][j] = subvector `sub` of sampled vector j, flattened
    // to [sub][j][dim-within-sub] layout.
    val sampled: Array[Array[Float]] = e.orderBy(col("vec_id").asc).limit(PqK)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val ds = sampled.head.length / PqM
    val codebook: Seq[Float] = (0 until PqM).flatMap(sub =>
      sampled.flatMap(v => v.slice(sub * ds, (sub + 1) * ds)))
    val corpus = e.select(col("vec_id"),
      F.pqCode(col("embedding"), codebook, PqM, PqK).as("code"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        F.pqTable(col("embedding"), codebook, PqM, PqK).as("tbl"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val shortlist = corpus.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("vec_id").as("neighbor_id"),
        F.pqAdc(col("tbl"), col("code"), PqM, PqK).as("adc"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= PqRerank)
    val cos = F.cosineSim(col("q_emb"), col("embedding"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(wCos))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), bp(col("cos")).as("cos_bp"))
  }
}

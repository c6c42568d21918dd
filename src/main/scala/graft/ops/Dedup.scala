package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols._
import graft.functions.F

/** Deduplication family over the documents table: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design (100 TB):
  * - exact dedup is one hash shuffle on md5(text) — linear.
  * - exact Jaccard uses PPJoin prefix filtering: per-doc sorted shingle
  *   hashes are one codegen pass (ShingleHashes), the candidate join
  *   touches only prefix postings (+ length filter), and candidates are
  *   verified by per-pair sorted-array intersection. The scale path is
  *   MinHash-LSH: signature build is map-only (MinHash128), the band
  *   join shuffles on (band, bucket-hash) — candidates are O(near-dups),
  *   not O(n²) — and only candidates are verified.
  * - SimHash blocks by pigeonhole: hamming ≤ 3 on 64 bits means at least
  *   one of 4 16-bit chunks is equal, so the pair join runs on chunk
  *   equality, never all-pairs.
  * - embedding dedup blocks on the label column (at scale: a coarse
  *   cluster id), so the pair join is per-block.
  */
object Dedup {


  /** Sorted distinct 3-shingle hashes per document: (doc_id, sh_arr, n).
    * ShingleHashes is one codegen'd pass per row — tokenize, hash each
    * shingle to 64 bits, sort, dedupe — replacing an interpreted
    * higher-order transform/array_distinct chain. Jaccard over the hash
    * sets equals Jaccard over the shingle strings up to n²/2⁶⁵ collision
    * odds — immaterial at any realistic corpus size. */
  private def shingleArrays(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        F.shingleHashes(split(col("text"), " "), 3).as("sh_arr"))
      .withColumn("n", size(col("sh_arr")))

  /** q50: exact dedup — group by md5(text), keep the smallest doc_id. */
  def q50(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** q51: exact n-gram Jaccard pairs (τ = 0.6) via prefix filtering
    * (the PPJoin candidate rule): under ANY global shingle order, two
    * sets with Jaccard ≥ τ must collide within their first
    * n − ⌈τ·n⌉ + 1 shingles — if they don't, the overlap fits in one
    * suffix, which is < τ·n ≤ |a∩b|. The global order here is the
    * 64-bit shingle hash itself, so ranking is a per-row sort_array
    * (map-only — no corpus-wide frequency pass, no extra shuffle).
    * The candidate join then touches O(prefix postings²) instead of
    * O(all postings²) — the difference between a prefix join and a full
    * inverted-index self-join at 100 TB. Candidates are verified
    * exactly by per-pair sorted-array intersection.
    *
    * A PPJoin length filter rides the candidate join: J ≥ τ forces
    * τ·na ≤ nb ≤ na/τ, pruning cross-size collisions before the
    * distinct. The array table is tiny relative to its source scan, so
    * it is cached and read three times (prefixes + both verify sides)
    * instead of recomputed. */
  def q51(s: SparkSession, d: String): DataFrame = {
    val arrs = shingleArrays(s, d).cache()
    val prefixLen = (col("n") - ceil(col("n") * 0.6).cast("int") + 1)
    val prefixes = arrs
      .select(col("doc_id"), col("n"),
        explode(slice(col("sh_arr"), lit(1), prefixLen)).as("sh"))
    val candidates = prefixes.as("a").join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
        col("b.n") * 0.6 <= col("a.n") && col("a.n") * 0.6 <= col("b.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jac = F.jaccardSorted(col("sh_a"), col("sh_b"))
    candidates
      .join(arrs.select(col("doc_id").as("doc_a"), col("sh_arr").as("sh_a")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("sh_arr").as("sh_b")), "doc_b")
      .filter(jac >= 0.6)
      .select(col("doc_a"), col("doc_b"), bp(jac).as("jaccard_bp"))
  }

  val MinhashPerms = 128
  val LshBands = 16
  val LshRows = 8 // MinhashPerms / LshBands

  /** q52: MinHash(128) + 16-band LSH candidates → exact-Jaccard verify
    * (τ = 0.6). With 8 rows/band, a 0.97-similar pair is missed with
    * probability ~(1-0.97⁸)¹⁶ ≈ 2e-11, so the verified output equals the
    * exact q51 result — and shares its oracle.
    *
    * The whole 128-min signature is ONE native expression pass per
    * document (MinHash128) — map-only, no shingle explode/shuffle and no
    * 128-column aggregate. Band hashes are xxhash64 over signature
    * slices. */
  def q52(s: SparkSession, d: String): DataFrame = {
    val arrs = shingleArrays(s, d).cache()
    val sigs = arrs
      .select(col("doc_id"), F.minhash128(col("sh_arr"), MinhashPerms).as("sig"))
    val bandCols = (0 until LshBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * LshRows + 1, LshRows)).as("bh"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Verify candidates with exact Jaccard via per-pair array
    // intersection: candidates are O(near-dups), so two narrow joins
    // fetch the shingle-hash arrays and the set math runs per row — no
    // re-explosion of the full shingle inventory.
    val jac = F.jaccardSorted(col("sh_a"), col("sh_b"))
    candidates
      .join(arrs.select(col("doc_id").as("doc_a"), col("sh_arr").as("sh_a")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("sh_arr").as("sh_b")), "doc_b")
      .filter(jac >= 0.6)
      .select(col("doc_a"), col("doc_b"), bp(jac).as("jaccard_bp"))
  }

  /** q53: 64-bit SimHash near-dup pairs (Hamming ≤ 3), blocked by the
    * 4×16-bit pigeonhole chunks. Token weights = 1 over distinct tokens.
    * The signature is one native-expression pass per document (map-only,
    * no explode/wide-agg — see SimHash64). */
  def q53(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"),
        F.simhash64(array_distinct(split(col("text"), " "))).as("simhash"))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"),
            shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.c").as("c"), col("ck.v").as("v"))
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        F.hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** q55: dedup clusters — connected components over the exact-Jaccard
    * near-dup pair graph (τ = 0.6), labeling every involved document with
    * the minimum doc_id reachable from it. Distributed min-label
    * propagation: each iteration is one join + one aggregation (both
    * shuffle on the node key), and the iteration count is the graph
    * diameter (near-dup clusters are shallow — a handful of rounds).
    * localCheckpoint truncates the growing lineage so round N's plan
    * doesn't replay rounds 1..N-1. */
  def q55(s: SparkSession, d: String): DataFrame = {
    val pairs = q51(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val prop = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      val next = labels.join(prop, col("node") === col("src"), "left_outer")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("new_label"))
        .localCheckpoint()
      changed = next.filter(col("new_label") < col("label")).count()
      labels = next.select(col("node"), col("new_label").as("label"))
      iter += 1
    }
    val sizes = labels.groupBy(col("label").as("cl")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, col("label") === col("cl"))
      .select(col("node").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** q54: embedding-cosine near-dup pairs (τ = 0.35), blocked on label.
    * Cosine runs in the native codegen'd expression, accumulated in
    * double in index order — bit-identical to the DuckDB oracle's
    * list_cosine_similarity over DOUBLE[]. */
  def q54(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cos = F.cosineSim(col("a.embedding"), col("b.embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(cos >= 0.35)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"), bp(cos).as("cos_bp"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}

/** Column-API facade over graft's native expressions. */
object F {
  private def u(c: Column) = GraftColumns.unwrap(c)

  /** Integral division on long columns, TRUNCATING toward zero — the
    * same semantics as DuckDB's `//` (verified: -7//2 = -3 in both), so
    * oracle parity holds for operands of any sign. The Column API's `/`
    * is always fractional double division, which goes inexact past
    * 2^53; this stays in exact long arithmetic. */
  def idiv(a: Column, b: Column): Column =
    GraftColumns.wrap(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(u(a), u(b)))

  /** 64-bit rolling polynomial hash of a string column. */
  def rollingHash64(c: Column): Column = GraftColumns.wrap(RollingHash64(u(c)))

  /** Hamming distance between two 64-bit signature columns. */
  def hamming64(l: Column, r: Column): Column = GraftColumns.wrap(HammingDistance64(u(l), u(r)))

  /** Cosine similarity between two array<float> columns. */
  def cosineSim(l: Column, r: Column): Column = GraftColumns.wrap(CosineSimilarity(u(l), u(r)))

  /** Jaro–Winkler similarity of two string columns in exact basis points. */
  def jaroWinklerBp(l: Column, r: Column): Column =
    GraftColumns.wrap(JaroWinklerBp(u(l), u(r)))

  /** LSH bucket codes (array<long>, one per table) for an embedding. */
  def hyperplaneBuckets(c: Column, masks: Seq[Long], bits: Int): Column =
    GraftColumns.wrap(HyperplaneBuckets(u(c), masks, bits))

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(c: Column): Column = GraftColumns.wrap(SimHash64(u(c)))
  def simhashMd5(c: Column): Column = GraftColumns.wrap(SimHashMd5(u(c)))

  /** Dictionary (forward-maximum-matching) segmentation of a string
    * column into array<string> — script runs segment against `dict`,
    * non-script runs pass through whole. */
  def fmmSegment(c: Column, dict: Seq[String]): Column =
    GraftColumns.wrap(FmmSegment(u(c), dict))

  /** Sorted distinct xxhash64 values of the word k-shingles of an
    * array<string> token column, one fused pass per row. */
  def shingleHashes(c: Column, k: Int = 3): Column =
    GraftColumns.wrap(ShingleHashes(u(c), k))

  /** Positional w-token window hashes (CDC cut-point scan). */
  def windowHashes64(c: Column, w: Int): Column =
    GraftColumns.wrap(WindowHashes64(u(c), w))

  /** MinHash signature (array<long> of `perms` minima) of an
    * array<long> shingle-hash column, one fused pass per row. */
  def minhash128(c: Column, perms: Int = 128): Column =
    GraftColumns.wrap(MinHash128(u(c), perms))

  /** Exact Jaccard similarity of two sorted distinct array<long>
    * columns — single zero-allocation merge pass. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftColumns.wrap(JaccardSorted(u(a), u(b)))

  /** Exact intersection size of two sorted distinct array<long>
    * columns — the raw overlap for asymmetric containment measures. */
  def intersectSize(a: Column, b: Column): Column =
    GraftColumns.wrap(IntersectSizeSorted(u(a), u(b)))

  /** Exact sparse dot product of two array<struct<h: long, w: long>>
    * columns sorted ascending by h — one zero-allocation merge pass. */
  def weightedDot(a: Column, b: Column): Column =
    GraftColumns.wrap(WeightedDotSorted(u(a), u(b)))

  /** Unicode NFC normalization of a string column (codegen'd, with an
    * allocation-free already-normalized fast path). */
  def nfc(c: Column): Column = GraftColumns.wrap(NfcNormalize(u(c)))

  /** One BPE merge step: collapse adjacent (a, b) symbols in an
    * array<string> column into the concatenation, left-to-right. */
  def mergeAdjacent(c: Column, a: String, b: String): Column =
    GraftColumns.wrap(MergeAdjacent(u(c), a, b))

  /** BPE-tokenize a word column with a learned merge table (the
    * lowest-rank-first apply loop). */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumns.wrap(BpeEncode(u(c), merges))

  /** Greedy longest-match-first (WordPiece) segmentation over
    * {code points} ∪ vocab. */
  def wordPieceEncode(c: Column, vocab: Seq[String]): Column =
    GraftColumns.wrap(WordPieceEncode(u(c), vocab))

  /** DP-minimum token count over {code points} ∪ vocab (see
    * MinSegTokens — q235's optimality lower bound). */
  def minSegTokens(c: Column, vocab: Seq[String]): Column =
    GraftColumns.wrap(MinSegTokens(u(c), vocab))

  /** Viterbi unigram-LM segmentation under an integer piece-cost table
    * (see UnigramEncode — the q319/q320 tokenizer). */
  def unigramEncode(c: Column, pieces: Seq[(String, Long)], maxLen: Int,
                    unkCost: Long): Column =
    GraftColumns.wrap(UnigramEncode(u(c), pieces, maxLen, unkCost))

  /** Z-order (Morton) key over two long columns — sort/range-partition
    * by this to cluster files for two-column data skipping. */
  def zorder2(a: Column, b: Column): Column =
    GraftColumns.wrap(ZOrder2(u(a), u(b)))

  /** Rank bucket of a double column among sorted quantile boundaries
    * (codegen'd binary search) — the skew-robust encode for z-ordering. */
  def rankBucket(c: Column, boundaries: Seq[Double]): Column =
    GraftColumns.wrap(SearchSortedBucket(u(c), boundaries))

  /** N-column Morton key (2..8 long columns, floor(64/N) bits each) —
    * multi-dimensional data-skipping layouts beyond two columns. */
  def zorderN(cols: Column*): Column =
    GraftColumns.wrap(ZOrderN(cols.map(u)))

  /** Bounded-heap top-k aggregate: descending array of the k largest
    * values of `c` (use struct(sort_key, payload…) for row top-k).
    * Partial-aggregates map-side: the shuffle carries O(groups·k). */
  def topK(c: Column, k: Int): Column =
    GraftColumns.wrap(TopKAgg(GraftColumns.unwrap(c), k).toAggregateExpression())

  /** Cross-engine-reproducible scalar hash: little-endian first 8 MD5
    * digest bytes (DuckDB md5_number_upper) as a signed long. */
  def md5Hash64(c: Column): Column = GraftColumns.wrap(Md5Hash64(u(c)))

  /** Exact integer square root of a non-negative integral column —
    * the double-sqrt candidate corrected by ±1 so s² ≤ n < (s+1)²
    * holds in every engine regardless of libm rounding (the q186
    * convention, shared by the q255 CCF normalizer; the oracle mirrors
    * the same CASE). Accepts long or decimal input. */
  def isqrtLong(c: Column): Column = {
    import org.apache.spark.sql.functions.{floor, sqrt, when}
    val cand = floor(sqrt(c.cast("double"))).cast("long")
    // correction squares run in decimal: (cand+1)² overflows a long
    // (ANSI: throws) once the input passes ~2⁶² — decimal(38,0) holds
    // any square of a long exactly
    def sq(x: Column): Column = x.cast("decimal(38,0)") * x.cast("decimal(38,0)")
    val cd = c.cast("decimal(38,0)")
    when(sq(cand + 1) <= cd, cand + 1)
      .when(sq(cand) > cd, cand - 1).otherwise(cand)
  }

  /** Draw `i` of the splitmix64 stream seeded by `h`:
    * mix64(h + i·φ64) in wrapping Java long arithmetic (a codegen'd
    * expression — composing this from `+`/`*` columns throws under
    * ANSI overflow checking, and the wraparound is the point).
    * Bit-identical to [[CmsEstimate.mix]]; DuckDB replays it via the
    * Mix64Ctes HUGEINT hi/lo emulation. One md5 + N mix64At calls
    * replaces N md5s wherever a row needs N independent draws (the
    * q208 bootstrap, MinHash's permutation family). */
  def mix64At(h: Column, i: Column): Column =
    GraftColumns.wrap(Mix64At(u(h), u(i)))

  /** KMV distinct sketch: the k unsigned-smallest distinct values of a
    * long hash column, ascending (see KmvMinAgg). */
  def kmvMin(c: Column, k: Int): Column =
    GraftColumns.wrap(KmvMinAgg(u(c), k).toAggregateExpression())

  /** Pack a bin's sorted (offset, token_id) cells into capacity·4
    * little-endian bytes, pad-tail-filled (see PackBinCells). */
  def packBinCells(c: Column, capacity: Int, padId: Int): Column =
    GraftColumns.wrap(PackBinCells(u(c), capacity, padId))

  /** Little-endian int32 array from a packed shard's bytes. */
  def unpackInts(c: Column): Column = GraftColumns.wrap(UnpackInts(u(c)))

  /** Elementwise vector-sum aggregate over array<float> (double out). */
  def vecSum(c: Column): Column =
    GraftColumns.wrap(VecSumAgg(GraftColumns.unwrap(c)).toAggregateExpression())

  /** Bloom-filter build aggregate over a long key column (binary out). */
  def bloomAgg(c: Column, numBits: Int, numHashes: Int = 5): Column =
    GraftColumns.wrap(
      BloomFilterAgg(GraftColumns.unwrap(c), numBits, numHashes).toAggregateExpression())

  /** Bloom membership probe; parameters must match the build side. */
  def bloomContains(filter: Column, key: Column, numBits: Int, numHashes: Int = 5): Column =
    GraftColumns.wrap(
      BloomMightContain(GraftColumns.unwrap(filter), GraftColumns.unwrap(key), numBits, numHashes))

  /** Count–Min sketch build aggregate over a long key column. */
  def cmsAgg(c: Column, width: Int, depth: Int = 4): Column =
    GraftColumns.wrap(
      CountMinAgg(GraftColumns.unwrap(c),
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        width, depth).toAggregateExpression())

  /** WEIGHTED Count–Min update: each row adds `w` to its key's
    * counters — feeding a pre-grouped (key, count) table builds the
    * byte-identical sketch in one corpus scan instead of two. */
  def cmsAggW(c: Column, w: Column, width: Int, depth: Int = 4): Column =
    GraftColumns.wrap(
      CountMinAgg(GraftColumns.unwrap(c), GraftColumns.unwrap(w),
        width, depth).toAggregateExpression())

  /** Count–Min point estimate; parameters must match the build side. */
  def cmsEstimate(sketch: Column, key: Column, width: Int, depth: Int = 4): Column =
    GraftColumns.wrap(
      CmsEstimate(GraftColumns.unwrap(sketch), GraftColumns.unwrap(key), width, depth))

  /** Cell ids ordered by quantized-integer L2 (asc, ties to lower id) —
    * element_at(..,1) assigns, slice(..,1,p) probes. Cross-engine exact. */
  def quantCellOrder(c: Column, centsQ: Seq[Seq[Long]], scale: Long): Column =
    GraftColumns.wrap(QuantCellOrder(u(c), centsQ, scale))

  /** Pure-integer squared L2 of two float arrays on the quantized grid. */
  def quantL2(a: Column, b: Column, scale: Long): Column =
    GraftColumns.wrap(QuantL2(u(a), u(b), scale))

  /** Integer-exact packed-nibble PQ code (quantized-grid assignment). */
  def pqCodeQ(c: Column, cbq: Seq[Long], m: Int, k: Int, scale: Long): Column =
    GraftColumns.wrap(PqCodeQ(u(c), cbq, m, k, scale))

  /** Integer ADC lookup table (array<long> of m·k quantized dots). */
  def pqTableQ(c: Column, cbq: Seq[Long], m: Int, k: Int, scale: Long): Column =
    GraftColumns.wrap(PqTableQ(u(c), cbq, m, k, scale))

  /** Integer ADC score from a PqTableQ table + packed code. */
  def pqAdcQ(table: Column, code: Column, m: Int, k: Int): Column =
    GraftColumns.wrap(PqAdcQ(u(table), u(code), m, k))

  /** Sorted distinct MD5 64-bit hashes of the k-token sliding windows
    * of an array<string> column (short docs → one whole-doc window). */
  def md5WindowHashes(c: Column, k: Int): Column =
    GraftColumns.wrap(Md5WindowHashes(u(c), k))
}

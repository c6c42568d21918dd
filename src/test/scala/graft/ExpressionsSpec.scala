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

  test("cosineSim of a zero-norm vector is 0, not NaN") {
    val rows = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(0.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b").select(F.cosineSim(col("a"), col("b"))).as[Double].collect()
    rows.foreach(v => assert(v == 0.0, s"zero-norm cosine must be 0.0, got $v"))
  }

  test("intersectSize counts the sorted-array overlap") {
    val got = Seq(
      (Array(1L, 3L, 5L), Array(3L, 5L, 7L)),
      (Array[Long](), Array(1L, 2L)),
      (Array(1L, 2L), Array(3L, 4L)))
      .toDF("a", "b").select(F.intersectSize(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == Seq(2, 0, 0))
  }

  test("bloom parameters are validated (numBits overflow guard)") {
    intercept[IllegalArgumentException] {
      graft.functions.BloomFilterAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), (1 << 30) + 1, 5)
    }
    intercept[IllegalArgumentException] {
      graft.functions.BloomFilterAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 1024, 0)
    }
  }

  test("bloom filter has no false negatives and a bounded fp rate") {
    val numBits = 1 << 16
    val members = (0L until 2000L).map(_ * 7 + 13)
    val bfBytes = members.toDF("k")
      .agg(F.bloomAgg(col("k"), numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    val bfDf = Seq(Tuple1(bfBytes)).toDF("bf")
    val memberHits = members.toDF("k").crossJoin(bfDf)
      .filter(F.bloomContains(col("bf"), col("k"), numBits)).count()
    assert(memberHits == members.size, "bloom dropped a member (false negative)")
    val nonMembers = (1L to 10000L).map(_ * 1000003L + 1)
    val fpHits = nonMembers.toDF("k").crossJoin(bfDf)
      .filter(F.bloomContains(col("bf"), col("k"), numBits)).count()
    // 2000 keys in 65536 bits, 5 hashes → theoretical fpp ≈ 0.3%.
    assert(fpHits < 200, s"false-positive rate too high: $fpHits / 10000")
  }

  test("q57 bloom probe prefilters below the semi-join exchange when the dim can't broadcast") {
    // The scale scenario: build side too big for a broadcast hash join
    // (but its Bloom filter still broadcastable). The probe filter must
    // run below the shuffle feeding the exact semi-join.
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = ops.Relational.q57(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("bloom_might_contain"), s"no bloom probe in plan:\n$plan")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning(o_custkey")
      val probeIdx = plan.indexOf("bloom_might_contain")
      assert(exchangeIdx >= 0, s"expected a shuffle for the exact semi-join:\n$plan")
      assert(probeIdx > exchangeIdx,
        s"bloom probe should filter before (print below) the shuffle:\n$plan")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("InferJaccardLengthFilter injects size bounds and preserves results") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L)),
      (2L, Seq(1L, 2L, 3L, 4L, 6L)),
      (3L, Seq(9L)))
      .toDF("id", "arr")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(F.jaccardSorted(col("a.arr"), col("b.arr")) >= 0.6)
    val optimized = pairs.queryExecution.optimizedPlan.toString
    assert("size\\(".r.findAllIn(optimized).size >= 2,
      s"length bounds not injected:\n$optimized")
    val got = pairs.select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }

  test("extensions register SQL functions (cosine_sim, hamming64, rolling_hash64)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c, " +
      "hamming64(1L, 3L) AS h, rolling_hash64('x') AS f").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 1)
  }

  test("extensions register the dedup SQL functions too") {
    val r = spark.sql(
      "SELECT shingle_hashes(array('a','b','c','d'), 2) AS sh, " +
      "simhash64(array('a','b')) AS sim, " +
      "jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j, " +
      "minhash128(array(1L, 2L), 4) AS mh, " +
      "intersect_size(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS c").head()
    assert(r.getSeq[Long](0).length == 3)           // 3 distinct 2-shingles
    assert(r.getSeq[Long](0).sorted == r.getSeq[Long](0))
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)  // |{2,3}| / |{1,2,3,4}|
    assert(r.getSeq[Long](3).length == 4)
    assert(r.getInt(4) == 2)                        // |{2,3}|
  }

  test("extensions register weighted_dot and the count-min SQL functions") {
    val dot = spark.sql(
      "SELECT weighted_dot(" +
      "array(named_struct('h', 1L, 'w', 2L), named_struct('h', 3L, 'w', 5L)), " +
      "array(named_struct('h', 1L, 'w', 10L), named_struct('h', 2L, 'w', 7L))) AS d").head()
    assert(dot.getLong(0) == 20L) // only h=1 matches: 2*10
    val cms = spark.sql(
      "SELECT cms_estimate(cms, 7L, 64, 2) AS est FROM " +
      "(SELECT cms_agg(k, 64, 2) AS cms FROM VALUES (7L), (7L), (9L) AS t(k))").head()
    assert(cms.getLong(0) >= 2L && cms.getLong(0) <= 3L)
  }

  test("shingleHashes matches the SQL-composed shingle pipeline") {
    val df = Seq("the quick brown fox jumps").toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val native = df.select(F.shingleHashes(col("toks"), 3).as("h"))
      .as[Seq[Long]].head().toSet
    val composed = df.select(expr(
      """transform(slice(toks, 1, greatest(size(toks) - 2, 0)),
         (x, i) -> xxhash64(concat_ws(' ', x, element_at(toks, i + 2), element_at(toks, i + 3))))""").as("h"))
      .as[Seq[Long]].head().toSet
    assert(native == composed)
  }

  test("jaccardSorted agrees with array_intersect arithmetic") {
    val gen = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(gen.nextInt(30) + 1)(gen.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(gen.nextInt(30) + 1)(gen.nextInt(40).toLong).distinct.sorted
      val got = Seq((a, b)).toDF("a", "b")
        .select(F.jaccardSorted(col("a"), col("b"))).as[Double].head()
      val want = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
      assert(got == want, s"a=$a b=$b")
    }
  }

  test("rankBucket counts boundaries at or below the value (binary search + ties)") {
    val bounds = Seq(1.0, 3.0, 3.0, 7.0)
    val got = Seq(0.0, 1.0, 2.0, 3.0, 5.0, 7.0, 9.0).toDF("v")
      .select(F.rankBucket(col("v"), bounds)).as[Long].collect().toSeq
    //            <1 →0, =1 →1, (1,3) →1, =3 →3 (ties upper), (3,7) →3, =7 →4, >7 →4
    assert(got == Seq(0L, 1L, 1L, 3L, 3L, 4L, 4L))
  }

  test("zorder2 interleaves losslessly and is SQL-registered") {
    import graft.functions.Bits
    val gen = new scala.util.Random(11)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0xFFFFFFFFL)) ++
      Seq.fill(20)((gen.nextLong() & 0xFFFFFFFFL, gen.nextLong() & 0xFFFFFFFFL))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), F.zorder2(col("a"), col("b")).as("z")).collect()
    got.foreach { r =>
      // De-interleaving the even/odd bit planes recovers both inputs.
      assert(Bits.unspread(r.getLong(2)) == r.getLong(0))
      assert(Bits.unspread(r.getLong(2) >>> 1) == r.getLong(1))
    }
    val viaSql = spark.sql("SELECT zorder2(3, 5)").head().getLong(0)
    assert(viaSql == Bits.interleave(3L, 5L))
  }

  test("zorderN round-trips 3- and 4-column values within their bit budget") {
    val gen = new scala.util.Random(13)
    def decode(z: Long, n: Int, i: Int): Long =
      (0 until 64 / n).map(j => ((z >>> (j * n + i)) & 1L) << j)
        .foldLeft(0L)(_ | _)
    // 3 columns: 21 bits each
    val triples = Seq((0L, 0L, 0L), ((1L << 21) - 1, 0L, (1L << 21) - 1)) ++
      Seq.fill(20)((gen.nextLong() & 0x1FFFFFL, gen.nextLong() & 0x1FFFFFL,
        gen.nextLong() & 0x1FFFFFL))
    triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        F.zorderN(col("a"), col("b"), col("c")).as("z")).collect()
      .foreach { r =>
        val z = r.getLong(3)
        assert(decode(z, 3, 0) == r.getLong(0) && decode(z, 3, 1) == r.getLong(1)
          && decode(z, 3, 2) == r.getLong(2))
      }
    // 4 columns: 16 bits each
    val quads = Seq.fill(20)(((gen.nextLong() & 0xFFFFL), (gen.nextLong() & 0xFFFFL),
      (gen.nextLong() & 0xFFFFL), (gen.nextLong() & 0xFFFFL)))
    quads.toDF("a", "b", "c", "d")
      .select(F.zorderN(col("a"), col("b"), col("c"), col("d")).as("z"),
        col("a"), col("b"), col("c"), col("d")).collect()
      .foreach { r =>
        val z = r.getLong(0)
        (0 until 4).foreach(i => assert(decode(z, 4, i) == r.getLong(i + 1)))
      }
  }

  test("nfc_normalize composes decomposed sequences and passes ASCII through") {
    val decomposed = "Cafe\u0301"   // e + combining acute (5 chars)
    val composed = "Caf\u00e9"       // precomposed é (4 chars)
    val rows = Seq(decomposed, composed, "plain ascii", "")
      .toDF("s").select(col("s"), F.nfc(col("s")).as("n"),
        length(F.nfc(col("s"))).as("len")).collect()
    assert(rows(0).getString(1) == composed && rows(0).getInt(2) == 4)
    assert(rows(1).getString(1) == composed)     // already-NFC: unchanged
    assert(rows(2).getString(1) == "plain ascii") // ASCII fast path
    assert(rows(3).getString(1) == "")
    // Post-normalization, both spellings hash identically — the dedup
    // property the expression exists for.
    val hashes = Seq(decomposed, composed).toDF("s")
      .select(md5(F.nfc(col("s")))).as[String].collect()
    assert(hashes(0) == hashes(1))
    // NOTE: Spark's chr() is byte-valued (chr(769) = chr(1), unlike
    // DuckDB's codepoint chr), so the combining mark rides in as a
    // string literal here.
    val viaSql = spark.sql("SELECT nfc_normalize(\'Cafe\\u0301\')")
      .head().getString(0)
    assert(viaSql == composed)
  }

  test("jaro_winkler_bp reproduces the textbook values exactly") {
    import SparkTestSession.spark.implicits._
    // classic worked examples, exact rationals floored to basis points:
    // martha/marhta 17/18 boosted → 0.96111; dixon/dicksonx → 0.81333;
    // dwayne/duane → 0.84 exactly; zero-match and identity extremes
    val cases = Seq(
      ("martha", "marhta", 9611L), ("dixon", "dicksonx", 8133L),
      ("dwayne", "duane", 8400L), ("same", "same", 10000L),
      ("abc", "xyz", 0L), ("", "", 10000L), ("a", "", 0L))
    val got = cases.toDF("a", "b", "want")
      .select(F.jaroWinklerBp(col("a"), col("b")).as("bp"), col("want"))
      .collect()
    got.zip(cases).foreach { case (r, (a, b, want)) =>
      assert(r.getLong(0) == want, s"jw($a, $b) = ${r.getLong(0)}, want $want")
    }
    // the SQL registration and the column helper agree
    val viaSql = spark.sql("SELECT jaro_winkler_bp('martha', 'marhta')")
      .head().getLong(0)
    assert(viaSql == 9611L)
  }

  test("fmm_segment: greedy longest match, singles fallback, run glue") {
    import SparkTestSession.spark.implicits._
    val dict = Seq("你好", "世界", "你好世", "今天")
    def seg(s: String): Seq[String] =
      Seq(s).toDF("t").select(F.fmmSegment(col("t"), dict))
        .head().getSeq[String](0)
    // greedy: the 3-char word beats the 2-char prefix at position 0;
    // the leftover single char falls back to char-level
    assert(seg("你好世界") == Seq("你好世", "界"))
    // exact dictionary cover
    assert(seg("今天你好") == Seq("今天", "你好"))
    // no dictionary word -> every script codepoint is its own token
    assert(seg("天氣") == Seq("天", "氣"))
    // non-script runs glue into single tokens around script segments
    assert(seg("abc你好def") == Seq("abc", "你好", "def"))
    // ascii fast path (byte-level space split) and empties
    assert(seg("hello") == Seq("hello"))
    assert(seg("hello  world ") == Seq("hello", "world"))
    assert(seg("") == Seq.empty)
    assert(seg("   ") == Seq.empty)
    // the fused expression IS whitespace tokenization + segmentation,
    // empty tokens dropped at the split
    val toks = Seq("a  b 你好世界x").toDF("t")
      .select(graft.ops.Text.dictTokens(col("t"), dict)).head().getSeq[String](0)
    assert(toks == Seq("a", "b", "你好世", "界", "x"))
    // the SQL registration (literal-array dictionary) agrees
    val viaSql = spark.sql(
      "SELECT fmm_segment('今天你好', array('你好', '今天'))")
      .head().getSeq[String](0)
    assert(viaSql == Seq("今天", "你好"))
  }

  test("md5_hash64 matches the JDK digest; kmv_min keeps k unsigned minima") {
    import SparkTestSession.spark.implicits._
    // scalar: little-endian first 8 digest bytes, signed reinterpretation
    val got = Seq("hello").toDF("t").select(F.md5Hash64(col("t"))).head().getLong(0)
    val d = java.security.MessageDigest.getInstance("MD5").digest("hello".getBytes("UTF-8"))
    var want = 0L
    for (b <- 7 to 0 by -1) want = (want << 8) | (d(b) & 0xffL)
    assert(got == want)
    // aggregate: distinct, capped at k, ascending in UNSIGNED order
    // (-1L = 0xFFFF... is the unsigned maximum and must be evicted)
    val vals = Seq(5L, 5L, -1L, 3L, 9L, 1L, 7L).toDF("h")
    val mins = vals.agg(F.kmvMin(col("h"), 4)).head().getSeq[Long](0)
    assert(mins == Seq(1L, 3L, 5L, 7L))
    // SQL registration agrees
    val viaSql = spark.sql("SELECT kmv_min(h, 4) FROM VALUES (5L),(3L),(9L),(1L),(7L) AS t(h)")
      .head().getSeq[Long](0)
    assert(viaSql == Seq(1L, 3L, 5L, 7L))
  }

  test("min_seg_tokens: DP optimum over chars + vocab, total on OOV") {
    val vocab = Seq("bc", "ab", "cd")
    val got = Seq("abcd", "xyz", "", "abcbc", "bcd")
      .toDF("w").select(F.minSegTokens(col("w"), vocab)).as[Int].collect()
    // abcd: ab+cd = 2 (greedy lowest-rank bc would give 3)
    // xyz: no vocab token applies — 3 base chars; empty word: 0
    // abcbc: ab+c+bc or a+bc+bc = 3; bcd: bc+d or b+cd = 2
    assert(got.toSeq == Seq(2, 3, 0, 3, 2), got.toSeq.toString)
    // never worse than character count, never better than ceil(len/max)
    val words = Seq("aaaa", "abab", "dcba", "abcabc").toDF("w")
      .select(col("w"), F.minSegTokens(col("w"), vocab).as("m")).collect()
    words.foreach { r =>
      val (w, m) = (r.getString(0), r.getInt(1))
      assert(m <= w.length && m >= (w.length + 1) / 2, s"$w -> $m")
    }
  }
}

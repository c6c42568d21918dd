package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.F

/** Randomized cross-checks of the native expressions against plain-Scala
  * reference implementations. Each property evaluates the expression
  * through a real (local) Spark plan — so the codegen path, not just
  * nullSafeEval, is exercised — on ScalaCheck-generated inputs. */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession.spark.implicits._

  /** Run a ScalaCheck property under scalatest (50 cases each — every
    * case is a small Spark job, so the count is deliberately modest). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  test("jaccardSorted and intersectSize match set arithmetic on random arrays") {
    check(forAll(sortedLongs, sortedLongs) { (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(F.jaccardSorted(col("a"), col("b")).as("j"),
          F.intersectSize(col("a"), col("b")).as("c"))
        .head()
      val common = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val wantJ = if (union == 0) 0.0 else common.toDouble / union
      row.getDouble(0) == wantJ && row.getInt(1) == common
    })
  }

  test("hamming64 matches Long.bitCount of xor on random longs") {
    check(forAll { (a: Long, b: Long) =>
      Seq((a, b)).toDF("a", "b").select(F.hamming64(col("a"), col("b")))
        .head().getInt(0) == java.lang.Long.bitCount(a ^ b)
    })
  }

  test("cosineSim stays in [-1, 1] and is symmetric on random vectors") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_.toFloat / 10f))
      .map(_.toArray)
    check(forAll(vec, vec) { (a, b) =>
      val r = Seq((a, b), (b, a)).toDF("a", "b")
        .select(F.cosineSim(col("a"), col("b"))).as[Double].collect()
      r(0) == r(1) && r(0) >= -1.0000001 && r(0) <= 1.0000001
    })
  }

  test("shingleHashes output is sorted, distinct, and has the right size") {
    val words = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
    check(forAll(words) { ws =>
      val arr = Seq(Tuple1(ws.toArray)).toDF("toks")
        .select(F.shingleHashes(col("toks"), 3)).head().getSeq[Long](0)
      val expectedMax = math.max(ws.length - 2, 0)
      (arr == arr.sorted) && arr.distinct.length == arr.length &&
        arr.length <= expectedMax
    })
  }

  test("fmm_segment is a lossless re-spacing: concat(segments) == input minus spaces") {
    // Whatever the dictionary and script mix, segmentation may only
    // re-cut the string at token boundaries — no codepoint may be
    // duplicated, dropped, or reordered. Runs over random mixes of
    // ASCII words, spaces, dictionary words, and out-of-dictionary
    // script codepoints (incl. an astral CJK-Ext-B ideograph, which
    // exercises the surrogate-pair walk).
    val dict = Seq("你好", "世界", "今天天氣", "สวัสดี")
    val atom = Gen.oneOf(Gen.oneOf("ab", "x", "Z9", " ", "  "),
      Gen.oneOf("你好", "世界", "今天天氣", "สวัสดี", "天", "氣", "ดี", "𠀋"))
    val input = Gen.listOf(atom).map(_.mkString)
    check(forAll(input) { s =>
      val segs = Seq(s).toDF("t")
        .select(F.fmmSegment(col("t"), dict)).head().getSeq[String](0)
      segs.mkString("") == s.filterNot(_ == ' ') && !segs.contains("")
    })
  }

  test("minhash signature is permutation-length and bounded by array min property") {
    // Signature entries are minima of hash mixes — adding an element can
    // only keep or lower each minimum (monotonicity of min under
    // superset), which is the property MinHash correctness rests on.
    check(forAll(sortedLongs.suchThat(_.nonEmpty)) { a =>
      val bigger = (a.toSet + 424242L).toArray.sorted
      val df = Seq((a, bigger)).toDF("a", "b")
        .select(F.minhash128(col("a"), 16).as("sa"), F.minhash128(col("b"), 16).as("sb"))
        .head()
      val sa = df.getSeq[Long](0); val sb = df.getSeq[Long](1)
      sa.length == 16 && sb.length == 16 &&
        sa.zip(sb).forall { case (x, y) => y <= x }
    })
  }

  test("min_seg_tokens matches a reference DP on random words and vocabularies") {
    def refDp(word: String, vocab: Seq[String]): Int = {
      val cps = word.toCharArray.map(_.toString) // a-d alphabet: 1 cp per char
      val n = cps.length
      val dp = Array.fill(n + 1)(Int.MaxValue)
      dp(0) = 0
      for (i <- 1 to n) {
        dp(i) = dp(i - 1) + 1
        vocab.distinct.foreach { t =>
          val l = t.length
          if (l <= i && cps.slice(i - l, i).mkString == t)
            dp(i) = math.min(dp(i), dp(i - l) + 1)
        }
      }
      dp(n)
    }
    val word = Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString)
    val vocab = Gen.listOfN(5,
      Gen.choose(2, 3).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf("a", "b", "c", "d")).map(_.mkString)))
    check(forAll(word, vocab) { (w, v) =>
      val got = Seq(Tuple1(w)).toDF("w")
        .select(F.minSegTokens(col("w"), v)).head().getInt(0)
      got == refDp(w, v)
    })
  }
}

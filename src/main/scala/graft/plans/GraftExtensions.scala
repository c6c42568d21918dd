package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions.{CmsEstimate, CosineSimilarity, CountMinAgg,
  FmmSegment, HammingDistance64, IntersectSizeSorted, JaccardSorted,
  JaroWinklerBp, KmvMinAgg, Md5Hash64, MinHash128, NfcNormalize,
  RollingHash64, ShingleHashes, SimHash64, TopKAgg, VecSumAgg,
  WeightedDotSorted, ZOrder2}

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works too.
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator planning: AsOfJoinNode → AsOfJoinExec.
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // Infer PPJoin length bounds from jaccard_sorted(a,b) >= τ filters.
    ext.injectOptimizerRule(_ => InferJaccardLengthFilter)
    // Rewrite eligible aggregates onto registered materialized cubes.
    ext.injectOptimizerRule(session => MaterializedAggRewrite(session))
    // Rewrite brute-force top-k cosine over registered base tables onto
    // the persisted IVF index's probed cells (opt-in approximate).
    ext.injectOptimizerRule(session => AnnIndexRewrite(session))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[HammingDistance64].getName, "hamming64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingDistance64(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (children: Seq[Expression]) => JaccardSorted(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("intersect_size"),
      new ExpressionInfo(classOf[IntersectSizeSorted].getName, "intersect_size"),
      (children: Seq[Expression]) => IntersectSizeSorted(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("md5_hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "md5_hash64"),
      (children: Seq[Expression]) => Md5Hash64(children.head)))
    // kmv_min(hash, k) — KMV distinct-sketch aggregate, k a literal.
    ext.injectFunction((
      new FunctionIdentifier("kmv_min"),
      new ExpressionInfo(classOf[KmvMinAgg].getName, "kmv_min"),
      (children: Seq[Expression]) =>
        KmvMinAgg(children.head, intLit("kmv_min", children(1))).toAggregateExpression()))
    // fmm_segment(text, array('word', ...)) — dictionary segmentation
    // with the lexicon as a literal array.
    ext.injectFunction((
      new FunctionIdentifier("fmm_segment"),
      new ExpressionInfo(classOf[FmmSegment].getName, "fmm_segment"),
      (children: Seq[Expression]) => FmmSegment(children.head,
        stringArrayLit("fmm_segment", children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler_bp"),
      new ExpressionInfo(classOf[JaroWinklerBp].getName, "jaro_winkler_bp"),
      (children: Seq[Expression]) => JaroWinklerBp(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
      (children: Seq[Expression]) => ZOrder2(children(0), children(1))))
    // shingle_hashes(toks [, k]) and minhash128(hashes [, perms]) take
    // their size parameter as an optional integer literal.
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head,
        children.lift(1).map(intLit("shingle_hashes", _)).getOrElse(3))))
    ext.injectFunction((
      new FunctionIdentifier("minhash128"),
      new ExpressionInfo(classOf[MinHash128].getName, "minhash128"),
      (children: Seq[Expression]) => MinHash128(children.head,
        children.lift(1).map(intLit("minhash128", _)).getOrElse(128))))
    // topk(value, k) — bounded-heap aggregate, k a literal integer.
    ext.injectFunction((
      new FunctionIdentifier("topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk"),
      (children: Seq[Expression]) =>
        TopKAgg(children.head, intLit("topk", children(1))).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[VecSumAgg].getName, "vec_sum"),
      (children: Seq[Expression]) =>
        VecSumAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("weighted_dot"),
      new ExpressionInfo(classOf[WeightedDotSorted].getName, "weighted_dot"),
      (children: Seq[Expression]) => WeightedDotSorted(children(0), children(1))))
    // cms_agg(key, width [, depth]) / cms_estimate(sketch, key, width [, depth])
    ext.injectFunction((
      new FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_agg"),
      (children: Seq[Expression]) =>
        CountMinAgg(children.head,
          org.apache.spark.sql.catalyst.expressions.Literal(1L),
          intLit("cms_agg", children(1)),
          children.lift(2).map(intLit("cms_agg", _)).getOrElse(4))
          .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) =>
        CmsEstimate(children(0), children(1), intLit("cms_estimate", children(2)),
          children.lift(3).map(intLit("cms_estimate", _)).getOrElse(4))))
  }

  private def intLit(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got $other")
  }

  /** Extract a foldable array<string> argument (e.g. `array('a','b')`)
    * — the SQL spelling of an expression-tree-constant dictionary. */
  private def stringArrayLit(fn: String, e: Expression): Seq[String] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn expects a literal array<string> dictionary, got $e")
    e.eval() match {
      case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
        ad.toObjectArray(org.apache.spark.sql.types.StringType).map {
          case null => throw new IllegalArgumentException(
            s"$fn dictionary contains a NULL element")
          case v => v.toString
        }.toSeq
      case other => throw new IllegalArgumentException(
        s"$fn dictionary did not fold to an array: $other")
    }
  }
}

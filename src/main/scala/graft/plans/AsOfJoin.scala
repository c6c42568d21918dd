package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumns, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen: a custom
  * `LogicalPlan` node, a `SparkStrategy` planning it, and a physical
  * `AsOfJoinExec` — the (c) tier of graft's operator preference order,
  * used because no built-in operator expresses "nearest right row ≤/≥
  * each left row" without either an inequality join (per-key quadratic)
  * or a union + window pass (buffers and re-sorts BOTH sides through one
  * window operator).
  *
  * The physical operator asks EnsureRequirements for hash clustering on
  * the key (both sides co-partitioned — one shuffle each, exactly like a
  * sort-merge join) and in-partition ordering (key, ts); the join itself
  * is then a single forward-only two-pointer merge per partition: O(n+m),
  * no buffering beyond one best-match slot, no window state. At 100 TB
  * this is the minimum-possible-shuffle as-of plan, and the merge never
  * holds more than two rows in memory per partition.
  *
  * Variants (all per-partition two-pointer, both sides ascending):
  * - backward (default): for each left row, the right row on the same
  *   key with the greatest rightTs ≤ leftTs; simultaneous right rows
  *   tie-break to the greatest rightTie. Matches ops.Events.asofJoin.
  * - forward: the right row with the SMALLEST rightTs ≥ leftTs, equal-ts
  *   ties to the greatest rightTie. Matches ops.Events.asofJoinForward.
  * - outer (either direction): unmatched left rows are kept with null
  *   asof_tie / asof_ts — the telemetry-enrichment shape ("every event,
  *   with its latest config if one exists").
  * Right rows whose ts OR tie evaluates to null never match (a null tie
  * must not be smuggled into a match slot — it would silently unbox
  * to 0 in the non-nullable inner output).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    forward: Boolean,
    isOuter: Boolean,
    tieAttr: AttributeReference,
    tsAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ tieAttr :+ tsAttr
  // tieAttr/tsAttr are minted here, not read from a child.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(tieAttr, tsAttr))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinNode into AsOfJoinExec. Injected via GraftExtensions
  * (or lazily by the AsOfJoin factory for sessions built without it). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right), n.leftKey, n.rightKey,
        n.leftTs, n.rightTs, n.rightTie, n.forward, n.isOuter, n.output) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    forward: Boolean,
    isOuter: Boolean,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.takeRight(2))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val rTie = BindReferences.bindReference(rightTie, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val fwd = forward
    val outer = isOuter
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(out, out)
      val matchRow = new GenericInternalRow(2)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // Current match candidate. Backward: the best (greatest ts, then
        // tie) right row consumed so far — right rows arrive in
        // (key, ts, tie) order, so the last consumed eligible row IS the
        // as-of match. Forward: the earliest not-yet-passed (key, ts)
        // run, with the run's greatest tie.
        private var mKey: Any = null
        private var mTs: Any = null
        private var mTie: Any = null
        private var haveMatch = false
        private var nextRow: InternalRow = null
        // Lazy advancement: `proj` reuses one UnsafeRow, so the next
        // match must not be projected until the consumer is done with
        // the row it was handed.
        private var ready = false

        /** Advance the right side until the candidate for left (k, t) is
          * current. Right rows with null key/ts/tie are skipped: a null
          * never matches, and (for backward) a stale candidate is simply
          * superseded by later consumed rows. */
        private def seek(k: Any, t: Any): Unit = {
          // Forward: a candidate run stays valid while its ts is still
          // ≥ the (ascending) left ts and the key matches; once passed,
          // re-seek. Backward always consumes as far as allowed.
          if (fwd && haveMatch &&
              (keyOrd.compare(mKey, k) != 0 || tsOrd.compare(mTs, t) < 0)) {
            haveMatch = false
          }
          var continue = !fwd || !haveMatch
          while (continue && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk = rKey.eval(rRow)
            if (rk == null) { rBuf.next(); }
            else {
              val kc = keyOrd.compare(rk, k)
              if (kc < 0) { rBuf.next() }
              else if (kc > 0) { continue = false }
              else {
                val rt = rTs.eval(rRow)
                val tie = rTie.eval(rRow)
                if (rt == null || tie == null) { rBuf.next() }
                else if (!fwd) {
                  if (tsOrd.compare(rt, t) <= 0) {
                    mKey = InternalRow.copyValue(rk)
                    mTs = InternalRow.copyValue(rt)
                    mTie = InternalRow.copyValue(tie)
                    haveMatch = true
                    rBuf.next()
                  } else { continue = false }
                } else {
                  if (tsOrd.compare(rt, t) < 0) { rBuf.next() } // too early for every remaining left row
                  else {
                    // Run start. Consume the whole equal-(key, ts) run:
                    // ties sort ascending, so the LAST row carries the
                    // max tie. The run must be consumed now — a later
                    // left row may still match it, which is why it is
                    // kept in the candidate slot, not the iterator.
                    mKey = InternalRow.copyValue(rk)
                    mTs = InternalRow.copyValue(rt)
                    mTie = InternalRow.copyValue(tie)
                    rBuf.next()
                    var run = true
                    while (run && rBuf.hasNext) {
                      val nr = rBuf.head
                      val sameRun = {
                        val nk = rKey.eval(nr)
                        nk != null && keyOrd.compare(nk, mKey) == 0 && {
                          val nt = rTs.eval(nr)
                          nt != null && tsOrd.compare(nt, mTs) == 0
                        }
                      }
                      if (sameRun) {
                        val ntie = rTie.eval(nr)
                        if (ntie != null) mTie = InternalRow.copyValue(ntie)
                        rBuf.next()
                      } else run = false
                    }
                    haveMatch = true
                    continue = false
                  }
                }
              }
            }
          }
        }

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && lIter.hasNext) {
            val lRow = lIter.next()
            val k = lKey.eval(lRow)
            val t = lTs.eval(lRow)
            var matched = false
            if (k != null && t != null) {
              seek(k, t)
              matched = haveMatch && keyOrd.compare(mKey, k) == 0 &&
                (!fwd || tsOrd.compare(mTs, t) >= 0)
            }
            if (matched) {
              matchRow.update(0, mTie)
              matchRow.update(1, mTs)
              nextRow = proj(joined(lRow, matchRow))
            } else if (outer) {
              matchRow.update(0, null)
              matchRow.update(1, null)
              nextRow = proj(joined(lRow, matchRow))
            }
          }
        }

        override def hasNext: Boolean = {
          if (!ready) { advance(); ready = true }
          nextRow != null
        }
        override def next(): InternalRow = {
          if (!ready) { advance(); ready = true }
          ready = false
          nextRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level factory for the native as-of join. Column names are
  * resolved against each side's analyzed plan; the result appends
  * `asof_tie` / `asof_ts` to the left schema (nullable iff `outer`). */
object AsOfJoin {
  def apply(left: DataFrame, leftKey: String, leftTs: String,
            right: DataFrame, rightKey: String, rightTs: String,
            rightTie: String,
            forward: Boolean = false, outer: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // Self-joins share attribute exprIds across both children, which
    // would make BindReferences resolve right-side expressions against
    // the left row. The built-in analyzer dedup only covers its own
    // node types, so reject the case loudly rather than mis-bind.
    val overlap = lp.outputSet.intersect(rp.outputSet)
    require(overlap.isEmpty,
      s"AsOfJoin cannot self-join one DataFrame instance (shared attributes: " +
        s"${overlap.toSeq.map(_.name).mkString(", ")}); re-read or re-create one side")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val tie = attr(rp, rightTie)
    val ts = attr(rp, rightTs)
    val node = AsOfJoinNode(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTs), ts, tie,
      forward, outer,
      AttributeReference("asof_tie", tie.dataType, nullable = outer)(),
      AttributeReference("asof_ts", ts.dataType, nullable = outer)())
    GraftColumns.ofRows(spark, node)
  }

  /** Idempotently make the session able to plan AsOfJoinNode, for
    * sessions built without GraftExtensions. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
    }
  }
}

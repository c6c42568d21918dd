package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Registry of MATERIALIZED AGGREGATE CUBES — the OLAP "aggregate
  * navigator" contract: a cube at `cubePath` holds, for every
  * combination of `dims` present in the base table at `basePath`, the
  * partial SUM of each measure (column `sum_<measure>`) and the row
  * count (column `cnt`). Because SUM and COUNT are self-decomposable,
  * ANY aggregation by a SUBSET of the dims re-aggregates exactly from
  * the cube — that algebra is what [[MaterializedAggRewrite]] applies.
  *
  * Registration is session-global mutable state by design (the same
  * shape as a catalog of materialized views); tests clear it. */
object CubeRegistry {
  case class Cube(basePath: String, cubePath: String,
                  dims: Set[String], measures: Set[String])

  @volatile private var cubes: List[Cube] = Nil

  def register(basePath: String, cubePath: String,
               dims: Seq[String], measures: Seq[String]): Unit =
    synchronized { cubes = Cube(basePath, cubePath, dims.toSet,
      measures.toSet) :: cubes }

  def clear(): Unit = synchronized { cubes = Nil }

  def all: Seq[Cube] = cubes

  /** Build + write the cube for a base parquet table: one distributed
    * groupBy over the full dim set, partial sums + count. At 100 TB
    * this is the one full-table aggregation the cube amortizes away —
    * every covered query afterwards reads |dim-combinations| rows. */
  def build(s: SparkSession, basePath: String, cubePath: String,
            dims: Seq[String], measures: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    s.read.parquet(basePath)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        measures.map(m => sum(col(m)).as(s"sum_$m")): _*)
      .write.mode("overwrite").parquet(cubePath)
    register(basePath, cubePath, dims, measures)
  }
}

/** Optimizer rule: rewrite an eligible Aggregate over a registered base
  * table onto its materialized cube — `SUM(m)` becomes `SUM(sum_m)`,
  * `COUNT(1)`/`COUNT(*)` becomes `SUM(cnt)`, grouping keys bind to the
  * cube's dim columns — so the query reads |dim-combinations| cube rows
  * instead of scanning the fact table. Eligible means provably exact:
  * grouping keys a subset of the cube dims, every aggregate a
  * non-distinct unfiltered SUM of a cubed measure or a COUNT(1), and
  * the scan an unfiltered (optionally column-pruned) read of the base
  * path — anything else is left untouched. Output attribute ids are
  * preserved through a top Project of aliases, so parent operators
  * resolve unchanged. The rewritten plan's own scan reads the cube
  * path, which no registration covers, so the rule cannot re-fire on
  * its own output. */
case class MaterializedAggRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption.map(_.toUri.getPath)
      case _ => None
    }
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case _ => None
  }

  /** Segment-boundary path match (same contract as AnnRewrite): an
    * unrelated table whose path merely ends with the registered string
    * (backup_lineitem.parquet vs lineitem.parquet) must NOT rewrite. */
  private def cubeFor(plan: LogicalPlan): Option[CubeRegistry.Cube] =
    scanPath(plan).flatMap { p =>
      CubeRegistry.all.find(c => p == new org.apache.hadoop.fs.Path(
        c.basePath).toUri.getPath || p.endsWith("/" + c.basePath))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate =>
      cubeFor(agg.child) match {
        case Some(cube) if eligible(agg, cube) => rewrite(agg, cube)
        case _ => agg
      }
  }

  private def eligible(agg: Aggregate, cube: CubeRegistry.Cube): Boolean = {
    val groupOk = agg.groupingExpressions.forall {
      case a: AttributeReference => cube.dims.contains(a.name)
      case _ => false
    }
    // every aggregate call must be rewritable; bare result attributes
    // must be grouping keys (guaranteed by analysis) — dims again
    val aggsOk = agg.aggregateExpressions.forall { ne =>
      val calls = ne.collect { case ae: AggregateExpression => ae }
      val callsOk = calls.forall {
        case AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _) =>
          cube.measures.contains(a.name)
        case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _) =>
          v != null // COUNT(NULL) must stay 0, not become SUM(cnt)
        case _ => false
      }
      val plainAttrsOk = ne match {
        case a: AttributeReference => cube.dims.contains(a.name)
        case _ => true
      }
      callsOk && plainAttrsOk
    }
    groupOk && aggsOk
  }

  private def rewrite(agg: Aggregate, cube: CubeRegistry.Cube): LogicalPlan = {
    val cubePlan = session.read.parquet(cube.cubePath)
      .queryExecution.analyzed
    val cubeAttr = cubePlan.output.map(a => a.name -> a).toMap

    def swap(e: Expression): Expression = e.transform {
      case ae @ AggregateExpression(Sum(a: AttributeReference, mode), _, false, None, _)
          if cube.measures.contains(a.name) =>
        ae.copy(aggregateFunction = Sum(cubeAttr(s"sum_${a.name}"), mode))
      case ae @ AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
          if v != null =>
        // global (no-grouping) COUNT over an empty base: SUM(cnt) over
        // an empty cube is NULL where COUNT(1) is 0 — coalesce restores
        // the COUNT contract (identity for every non-empty group)
        org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
          ae.copy(aggregateFunction = Sum(cubeAttr("cnt"))),
          Literal(0L)))
      case a: AttributeReference if cube.dims.contains(a.name) =>
        cubeAttr(a.name)
    }

    val newGrouping = agg.groupingExpressions.map(swap)
    // inner aggregate outputs fresh names; a top Project re-aliases
    // them onto the ORIGINAL expression ids so parents resolve intact
    val inner = agg.aggregateExpressions.map { ne =>
      Alias(swap(ne match {
        case Alias(childE, _) => childE
        case other => other
      }), ne.name)()
    }
    val newAgg = Aggregate(newGrouping, inner, cubePlan)
    val restore = agg.aggregateExpressions.zip(newAgg.output).map {
      case (orig, fresh) =>
        Alias(castIfNeeded(fresh, orig), orig.name)(exprId = orig.exprId)
    }
    Project(restore, newAgg)
  }

  /** COUNT(1) is LongType while its SUM(cnt) replacement re-aggregates
    * to LongType too, but SUM over a long is nullable — cast/coerce to
    * the original data type so the swap is schema-invisible. */
  private def castIfNeeded(fresh: Attribute,
                           orig: NamedExpression): Expression =
    if (fresh.dataType == orig.dataType) fresh
    else org.apache.spark.sql.catalyst.expressions.Cast(fresh, orig.dataType)
}

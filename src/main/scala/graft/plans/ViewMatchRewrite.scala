package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, max, min, sum}
import org.apache.spark.sql.graftglue.GraftBridge

import graft.sources.MatViews

/** Injected optimizer rule: aggregates over a fact scan are answered
  * from a registered materialized view ([[MatViews]]) — the automatic
  * view-matching engines like Calcite, BigQuery, and Snowflake ship,
  * here for the [[graft.streaming.AggTableSink]]-maintained table
  * shape.
  *
  * A dashboard writes
  *
  * {{{
  * SELECT asset, count(*), sum(v) FROM facts
  * WHERE day BETWEEN … GROUP BY asset
  * }}}
  *
  * and vanilla Spark scans the 100 TB fact table — even though a
  * maintained |groups|-row rollup at the (asset, day) grain already
  * holds everything the query needs. This rule detects the
  * containment and rewrites to the view: grouping a SUBSET of the
  * view's grain, filters over view grain columns only, measures
  * derivable by compensation — `sum(e)` → `sum(s_e)`, `count(*)` →
  * `sum(cnt)`, `min/max(e)` → `min/max(m_e)` (sums exact for
  * decimal/integral measures — the repo's posture; min/max exact for
  * any type). The fact scan disappears from the plan entirely; the
  * query's cost becomes O(|view|), independent of the facts.
  *
  * Eligibility (conservative — anything else left untouched):
  *   - `Aggregate` over `[Filter]`/attribute-only-`Project` chains
  *     ending in a V1 parquet scan whose root path has a registered
  *     view (the path IS the match key — no table catalog needed);
  *   - grouping expressions are plain attributes whose names ⊆ the
  *     view's group columns; filter conjuncts reference group-column
  *     attributes only (a slice the view can answer exactly —
  *     predicates re-apply verbatim to the view's grain rows);
  *   - every aggregate is non-distinct, unfiltered, and one of:
  *     `sum(e)` with `e` registered as a summed measure, `count(*)`
  *     / `count(1)` with a registered count column, `min(e)`/`max(e)`
  *     with `e` registered under the matching min/max measure —
  *     where "registered" compares the optimizer-normalized,
  *     qualifier-free SQL of `e` ([[MatViews.canonicalSql]]'s
  *     structural match, so `sum(CAST(round(value, 6) AS
  *     DECIMAL(18,6)))` finds its measure and `sum(value)` — a
  *     different aggregate — correctly misses).
  *
  * Exactness: group universes agree (a view-grain group exists iff a
  * fact row exists; re-grouping a subset grain produces exactly the
  * groups the direct aggregate would); NULL group keys are one group
  * on both routes; compensated sums re-cast to the direct aggregate's
  * result type (wider partials, same values). Compensation types
  * widen (`sum` over a view `sum` column) and are cast back to the
  * original attribute's type, preserving exprIds, so parents resolve
  * unchanged. Currency of the view is the registrant's contract —
  * the rule trusts [[MatViews]]; a stale registration is a stale
  * answer, which is why registration is explicit and path-scoped.
  *
  * Session conf: `spark.graft.viewMatch.auto` (default true).
  */
case class ViewMatchRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = spark.sessionState.conf
      .getConfString("spark.graft.viewMatch.auto", "true").toBoolean
    if (!on) plan
    else plan.transformUp {
      case a @ Aggregate(_, _, child, _) =>
        rewrite(a, child).getOrElse(a)
    }
  }

  /** Strip [Filter]/attr-only-Project chains down to a V1 file scan,
    * collecting filter conjuncts. */
  private def unwrap(plan: LogicalPlan,
      conds: Seq[Expression]): Option[(Seq[Expression], LogicalRelation)] =
    plan match {
      case Filter(c, child) => unwrap(child, conds ++ splitConjunctivePredicates(c))
      case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, conds)
      case l: LogicalRelation => Some((conds, l))
      case _ => None
    }

  private def rewrite(agg: Aggregate, child: LogicalPlan): Option[LogicalPlan] = {
    val (conds, scan) = unwrap(child, Nil).getOrElse(return None)
    val srcPath = scan.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        fs.location.rootPaths.head.toUri.getPath
      case _ => return None
    }
    val mv = MatViews.lookup(srcPath).getOrElse(return None)
    val groupSet = mv.groupCols.toSet

    // grouping: plain attributes on view grain columns
    val groups = agg.groupingExpressions.map {
      case a: AttributeReference if groupSet.contains(a.name) => a
      case _ => return None
    }
    if (groups.isEmpty) return None // grouped views answer grouped queries
    if (groups.map(_.name).distinct.length != groups.length) return None
    // filters: grain columns only
    if (!conds.forall(_.references.forall {
      case a: AttributeReference => groupSet.contains(a.name)
      case _ => false
    })) return None

    // classify outputs; Comp = how the view re-derives one column
    sealed trait Comp
    case class GroupCol(name: String) extends Comp
    case class SumOf(mvCol: String) extends Comp
    case class CountOf(mvCol: String) extends Comp
    case class MinOf(mvCol: String) extends Comp
    case class MaxOf(mvCol: String) extends Comp
    val groupAttrSet = AttributeSet(groups)
    def classifyAgg(f: AggregateFunction): Option[Comp] = f match {
      case Count(Seq(Literal(1, _))) => mv.countCol.map(CountOf.apply)
      case Sum(e, _) =>
        val sql = MatViews.canon(e)
        mv.sums.collectFirst { case (n, s) if s == sql => SumOf(n) }
      case Min(e) =>
        val sql = MatViews.canon(e)
        mv.mins.collectFirst { case (n, s) if s == sql => MinOf(n) }
      case Max(e) =>
        val sql = MatViews.canon(e)
        mv.maxs.collectFirst { case (n, s) if s == sql => MaxOf(n) }
      case _ => None
    }
    def classify(ne: NamedExpression): Option[Comp] = ne match {
      case a: AttributeReference if groupAttrSet.contains(a) => Some(GroupCol(a.name))
      case Alias(a: AttributeReference, _) if groupAttrSet.contains(a) =>
        Some(GroupCol(a.name))
      case Alias(AggregateExpression(f, Complete, false, None, _), _) =>
        classifyAgg(f)
      // a presentation Cast around the aggregate (the CAST(sum(…) AS
      // DOUBLE) idiom): compensate inside, cast to the outer type —
      // the compensated decimal/integral value is exact, so the final
      // cast lands on the same value the direct path casts
      case Alias(Cast(AggregateExpression(f, Complete, false, None, _), _, _, _), _) =>
        classifyAgg(f)
      case _ => None
    }
    val outs = agg.aggregateExpressions.map(ne => ne -> classify(ne).getOrElse(return None))

    // ---- build the replacement over the view table ----
    val mvDf0 =
      if (mv.publish) graft.sources.Publish.read(spark, mv.mvPath)
      else spark.read.parquet(mv.mvPath)
    val mvAttr = mvDf0.queryExecution.analyzed.output.map(a => a.name -> a).toMap
    // every grain column exists on the view by construction, so the
    // by-name rebase of the (grain-only) filters is total
    def rebase(e: Expression): Expression = e.transform {
      case a: AttributeReference => mvAttr(a.name)
    }
    val filtered = conds.foldLeft(mvDf0)((df, c) =>
      df.where(GraftBridge.column(rebase(c))))

    val compCols: Seq[Column] = outs.collect {
      case (ne, SumOf(n))   => sum(col(n)).cast(ne.dataType).as(s"__c_${ne.exprId.id}")
      case (ne, CountOf(n)) => sum(col(n)).cast(ne.dataType).as(s"__c_${ne.exprId.id}")
      case (ne, MinOf(n))   => min(col(n)).cast(ne.dataType).as(s"__c_${ne.exprId.id}")
      case (ne, MaxOf(n))   => max(col(n)).cast(ne.dataType).as(s"__c_${ne.exprId.id}")
    }
    if (compCols.isEmpty) return None // pure-distinct grain listing: not this rule's shape
    val groupNames = groups.map(_.name)
    val comp = filtered
      .groupBy(groupNames.map(col): _*)
      .agg(compCols.head, compCols.tail: _*)

    // project back to the Aggregate's own output attributes
    val res = comp.queryExecution.analyzed
    val byName = res.output.map(a => a.name -> a).toMap
    val projList = outs.map { case (ne, c) =>
      val src = c match {
        case GroupCol(n) => byName(n)
        case _           => byName(s"__c_${ne.exprId.id}")
      }
      Alias(src, ne.name)(exprId = ne.exprId)
    }
    Some(Project(projList, res))
  }
}

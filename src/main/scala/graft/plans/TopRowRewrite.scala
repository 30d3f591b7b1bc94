package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Injected optimizer rule: the `row_number() = 1` keep-one-per-group
  * antipattern becomes a hash aggregation.
  *
  * The single most common dedupe idiom in analytics SQL (the
  * reference dedupes market-data rows exactly this way —
  * core_coin_market_data.py:54-58, the shape [[graft.operators
  * .WindowOps.dedupeFirst]] wraps):
  *
  * {{{
  * SELECT k, s, t, v FROM (
  *   SELECT *, row_number() OVER (PARTITION BY k ORDER BY t, id) AS rn
  *   FROM events
  * ) WHERE rn = 1
  * }}}
  *
  * Spark plans the window as sort + exchange + sort: Spark 4's own
  * mitigation (`InferWindowGroupLimit`) thins the EXCHANGE — a
  * Partial WindowGroupLimit keeps each task's per-group minima before
  * the shuffle — but gets there by FULLY SORTING every map task by
  * (k, t, id) first, and the reduce side sorts again; at 100 TB those
  * local sorts are the dominant cost and the spill risk. But
  * `rn = 1` keeps exactly the (partition-key-grouped) minimum under
  * the ORDER BY — an aggregation, not a window: `min_by(struct(values),
  * struct(orderKeys))` computes it with map-side PARTIAL aggregation —
  * one streaming fold, no (k, t, id) sort on either side of the
  * exchange, and each mapper ships one candidate row per group it has
  * seen. (The struct-typed buffer keeps the aggregate off the
  * fixed-width hash path, so the physical op is a SortAggregate
  * sorting by the GROUP KEY only — strictly less ordering work than
  * the window's (key, orderBy...) sort.) Flink ships precisely this
  * rewrite as its `Deduplicate` operator; this rule brings it to
  * declared Spark SQL.
  *
  * Eligibility (conservative — anything else is left untouched):
  *   - `Filter` over a `Window` (or over an attribute-only `Project`
  *     of one, and looking through an inferred `WindowGroupLimit`);
  *   - the Window computes EXACTLY one expression: `row_number()`
  *     over (partition, order) with the default running frame — more
  *     window columns would be lost by grouping;
  *   - filter condition: conjuncts over the row-number attribute only
  *     — `rn = 1` / `1 = rn` / `rn <= 1` / `rn < 2` (each keeps only
  *     the per-group first row) plus any inferred `IsNotNull(rn)`;
  *     the filter may not reference other columns;
  *   - partition keys are plain attributes; order keys are attributes
  *     ordered in ONE direction with the default null placement
  *     (all `ASC NULLS FIRST` or all `DESC NULLS LAST`) — exactly the
  *     orderings a lexicographic struct comparison reproduces
  *     (ascending struct compare puts null fields first, so `min_by`
  *     matches ASC NULLS FIRST; its mirror matches DESC NULLS LAST).
  *
  * The rewrite groups by the partition keys and takes
  * `min_by`/`max_by` of the payload struct over the order-key struct,
  * then restores the original output attributes (exprIds preserved
  * via aliases, so parents resolve unchanged; a surviving `rn`
  * output becomes the literal 1 it is provably equal to). Group
  * universes match exactly: a window partition and a group-by group
  * both exist iff a row exists, and both treat NULL keys as a
  * regular value. One documented divergence, [[AsOfRewrite]]'s
  * posture verbatim: on an ORDER BY TIE `row_number` picks an
  * arbitrary winner and `min_by` picks a (different) arbitrary
  * winner — the rewrite replaces one arbitrary choice with another,
  * never a wrong row; queries with a unique tiebreaker (every graft
  * registry query; the reference's dedupe orders by a unique
  * timestamp) are deterministic and exact.
  *
  * Injected pre-CBO: after pushdown/pruning normalized the child,
  * and the replacement Aggregate can never re-match the
  * Filter-over-Window pattern.
  *
  * Session conf: `spark.graft.topRow.auto` (default true).
  */
case class TopRowRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = spark.sessionState.conf
      .getConfString("spark.graft.topRow.auto", "true").toBoolean
    if (!on) plan
    else plan.transformUp {
      case f @ Filter(cond, child) =>
        unwrapWindow(child).flatMap(w => rewrite(cond, w)).getOrElse(f)
    }
  }

  /** The Window under the filter, looking through a pruning-only
    * projection that keeps the row-number attribute, and through the
    * WindowGroupLimit node InferWindowGroupLimit may already have
    * planted between them (it runs earlier in the optimizer). */
  private def unwrapWindow(plan: LogicalPlan): Option[(Window, Option[Seq[AttributeReference]])] =
    plan match {
      case w: Window => Some((w, None))
      case Project(projectList, w: Window)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        Some((w, Some(projectList.map(_.asInstanceOf[AttributeReference]))))
      case _ => None
    }

  private def rewrite(
      cond: Expression,
      wp: (Window, Option[Seq[AttributeReference]])): Option[LogicalPlan] = {
    val (w, proj) = wp

    // exactly one window expression: row_number() over the default
    // running frame (the analyzer pins row_number's frame to
    // ROWS UNBOUNDED PRECEDING .. CURRENT ROW)
    val rnAttr = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
        a.toAttribute
      case _ => return None
    }

    // every filter conjunct must pin rn to the first row
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.isEmpty) return None
    val keepsFirst = conjuncts.forall {
      case EqualTo(a: AttributeReference, IntegerLiteral(1)) => a.semanticEquals(rnAttr)
      case EqualTo(IntegerLiteral(1), a: AttributeReference) => a.semanticEquals(rnAttr)
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => a.semanticEquals(rnAttr)
      case LessThan(a: AttributeReference, IntegerLiteral(2)) => a.semanticEquals(rnAttr)
      case GreaterThanOrEqual(IntegerLiteral(1), a: AttributeReference) => a.semanticEquals(rnAttr)
      case GreaterThan(IntegerLiteral(2), a: AttributeReference) => a.semanticEquals(rnAttr)
      case IsNotNull(a: AttributeReference) => a.semanticEquals(rnAttr)
      case _ => false
    }
    // rn = 1 (or an equivalent) must actually be present — bare
    // IsNotNull(rn) alone filters nothing
    val pins = conjuncts.exists {
      case IsNotNull(_) => false
      case _ => true
    }
    if (!keepsFirst || !pins) return None

    // partition: plain attributes (dedup — PARTITION BY k, k is legal)
    val partKeys = w.partitionSpec.map {
      case a: AttributeReference => a
      case _ => return None
    }.foldLeft(Vector.empty[AttributeReference]) { (acc, a) =>
      if (acc.exists(_.semanticEquals(a))) acc else acc :+ a
    }

    // order: attributes, one direction, default null placement
    if (w.orderSpec.isEmpty) return None
    val orderAttrs = w.orderSpec.map {
      case SortOrder(a: AttributeReference, dir, nulls, _)
          if nulls == dir.defaultNullOrdering => (a, dir)
      case _ => return None
    }
    val ascending = orderAttrs.head._2 == Ascending
    if (!orderAttrs.forall(_._2 == (if (ascending) Ascending else Descending)))
      return None
    val orderKeys = orderAttrs.map(_._1)

    // strip the WindowGroupLimit InferWindowGroupLimit may have
    // planted (it keeps a SUPERSET — rank ≤ limit — of what the
    // aggregate recomputes exactly, so dropping it is sound)
    val child = w.child match {
      case WindowGroupLimit(_, _, _, _, gchild) => gchild
      case c => c
    }
    // payload = child outputs that are not group keys (group keys pass
    // through the grouping; everything else rides the min_by struct)
    val partSet = AttributeSet(partKeys)
    val payload = child.output.filterNot(partSet.contains)

    val orderStruct = CreateStruct(orderKeys)
    val payloadStruct = CreateStruct(payload)
    val pickFn: (Expression, Expression) => aggregate.AggregateFunction =
      if (ascending) (v, o) => aggregate.MinBy(v, o)
      else (v, o) => aggregate.MaxBy(v, o)
    val picked = AggregateExpression(
      pickFn(payloadStruct, orderStruct), aggregate.Complete, isDistinct = false)
    val pickedAlias = Alias(picked, "__graft_top_row")()
    val agg = Aggregate(
      partKeys, (partKeys :+ pickedAlias).toSeq, child, None)

    // restore the pre-rewrite output attributes: the filter's output
    // is its child's output (the projection's, or the Window's)
    val outAttrs: Seq[Attribute] = proj.getOrElse(w.output)
    val payloadIdx = payload.map(_.exprId).zipWithIndex.toMap
    val pickedRef = pickedAlias.toAttribute
    val restored = outAttrs.map { a =>
      if (a.semanticEquals(rnAttr))
        Alias(Literal(1), a.name)(exprId = a.exprId)
      else if (partSet.contains(a))
        partKeys.find(_.semanticEquals(a)) match {
          case Some(pk) if pk.exprId == a.exprId => pk
          case Some(pk) => Alias(pk, a.name)(exprId = a.exprId)
          case None => return None
        }
      else payloadIdx.get(a.exprId) match {
        case Some(i) =>
          Alias(GetStructField(pickedRef, i, Some(a.name)), a.name)(exprId = a.exprId)
        case None => return None
      }
    }
    Some(Project(restored, agg))
  }
}

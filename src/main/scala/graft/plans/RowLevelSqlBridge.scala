package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.SqlInternals
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}

import graft.sources.{GraftCatalog, Merge, Txn, Updates}

/** The SQL row-level-write bridge: `MERGE INTO` / `UPDATE` / `DELETE`
  * statements against a [[GraftCatalog]] LIVE table re-route onto the
  * library's tested commit-protocol operators instead of requiring
  * the table to implement Spark's `SupportsRowLevelOperations` stack.
  *
  * A post-hoc resolution rule (the Delta-lineage interception point:
  * analysis has RESOLVED the statement — attributes are bound to the
  * target and source relations — but capability checks haven't run)
  * replaces the fully-resolved `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable` with an eagerly-executed command that:
  *
  *   - DELETE → [[Updates.deleteRewritePublished]] (copy-on-write,
  *     file-pruned — the SQL catalog serves tables sidecar-free, so
  *     the fold-now form, not the DV accumulate-first policy);
  *   - UPDATE → [[Updates.updatePublished]];
  *   - MERGE  → [[Merge.mergeIntoPublished]], including the
  *     `WHEN NOT MATCHED BY SOURCE` branches (the reference's
  *     full-sync DELETE+INSERT rebuild as one standard statement).
  *
  * Each command wraps its operator in [[Txn.retry]], so racing SQL
  * writers serialize by CAS + re-derivation exactly like API writers.
  * Resolved target attributes translate to plain column names,
  * source attributes to [[Merge.s]]-prefixed names — the operators
  * re-resolve them against their own scans, so the bridge never
  * smuggles foreign `exprId`s into a new plan. Statements the
  * operators cannot express (subqueries in conditions, >1 action per
  * match group beyond the update+delete pair, schema-evolving MERGE)
  * refuse loudly rather than approximating.
  *
  * Only the LIVE writable load carries the [[GraftCatalog.GraftWritable]]
  * marker: `VERSION AS OF` / snapshot-mode targets fall through to
  * Spark's own capability error — row-level SQL against history is
  * refused, the immutability contract.
  */
case class RowLevelSqlBridge(spark: SparkSession) extends Rule[LogicalPlan] {

  import RowLevelSqlBridge._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(target, cond) if d.resolved =>
      writable(target).fold(plan: LogicalPlan) { case (root, tOut) =>
        GraftDeleteCommand(root, cond, tOut)
      }
    case u @ UpdateTable(target, assignments, cond) if u.resolved =>
      writable(target).fold(plan: LogicalPlan) { case (root, tOut) =>
        GraftUpdateCommand(root, assignments, cond, tOut)
      }
    case m @ MergeIntoTable(target, source, mergeCond,
        matched, notMatched, bySource, _) if m.resolved =>
      writable(target).fold(plan: LogicalPlan) { case (root, tOut) =>
        refuse(m.schemaEvolutionEnabled,
          "MERGE WITH SCHEMA EVOLUTION is not supported through the SQL " +
            "bridge — use Merge.mergeIntoPublished(evolveSchema = true)")
        GraftMergeCommand(root, source, mergeCond,
          matched, notMatched, bySource, tOut)
      }
    case _ => plan
  }
}

object RowLevelSqlBridge {

  /** The target's GraftCatalog root + output attrs, when (and only
    * when) the statement addresses a live writable load. */
  private def writable(plan: LogicalPlan): Option[(String, Seq[Attribute])] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftCatalog.GraftWritable] =>
        (r.table.asInstanceOf[GraftCatalog.GraftWritable].graftRoot, r.output)
    }

  private def refuse(bad: Boolean, msg: String): Unit =
    if (bad) throw new UnsupportedOperationException(msg)

  /** Rebind a resolved expression for re-resolution inside the
    * operators: target attrs → plain names, source attrs →
    * [[Merge.s]]-prefixed names (the merge join's source namespace).
    * Refuses subqueries — the operators take Columns, not plans. */
  private def toColumn(
      e: Expression,
      targetIds: Set[Long],
      sourceIds: Set[Long],
      sourceAsPlain: Boolean = false): Column = {
    refuse(e.exists(_.isInstanceOf[SubqueryExpression]),
      s"subqueries are not supported in graft row-level SQL statements: ${e.sql}")
    val rebound = e.transform {
      case a: AttributeReference if targetIds.contains(a.exprId.id) =>
        refuse(sourceAsPlain,
          s"this clause may reference only SOURCE columns: ${e.sql}")
        UnresolvedAttribute.quoted(a.name)
      case a: AttributeReference if sourceIds.contains(a.exprId.id) =>
        if (sourceAsPlain) UnresolvedAttribute.quoted(a.name)
        else UnresolvedAttribute.quoted("__s_" + a.name)
      case a: AttributeReference =>
        throw new UnsupportedOperationException(
          s"unresolvable reference '${a.name}' in row-level SQL statement")
    }
    SqlInternals.column(rebound)
  }

  /** A clause condition with target-only references (the NOT MATCHED
    * BY SOURCE branches: there is no source row to name). */
  private def targetOnly(
      e: Expression, targetIds: Set[Long], sourceIds: Set[Long]): Column = {
    refuse(e.exists {
      case a: AttributeReference => sourceIds.contains(a.exprId.id)
      case _ => false
    }, s"WHEN NOT MATCHED BY SOURCE conditions may reference only " +
      s"target columns: ${e.sql}")
    toColumn(e, targetIds, sourceIds)
  }

  private def assignName(a: Assignment): String = a.key match {
    case attr: AttributeReference => attr.name
    case other => throw new UnsupportedOperationException(
      s"only top-level column assignments are supported: ${other.sql}")
  }

  /** One match group's update+delete pair folded to the operators'
    * (set, deleteWhen) shape with SQL clause-order semantics: the
    * FIRST clause whose condition holds wins, so an update-first
    * group guards the delete with the update condition's negation.
    * Returns (set, setGate, deleteWhen). */
  private def foldGroup(
      actions: Seq[MergeAction],
      toCol: Expression => Column): (Seq[Assignment], Option[Column], Option[Column]) =
    actions match {
      case Seq() => (Nil, None, None)
      case Seq(u: UpdateAction) =>
        (u.assignments, u.condition.map(toCol), None)
      case Seq(d: DeleteAction) =>
        (Nil, None, Some(d.condition.map(toCol).getOrElse(lit(true))))
      case Seq(u: UpdateAction, d: DeleteAction) =>
        // update first: a row passing the update condition updates;
        // delete applies only to the remainder
        val cu = u.condition.map(toCol)
        val cd = d.condition.map(toCol).getOrElse(lit(true))
        val dw = cu match {
          case Some(c) => Some(not(coalesce(c, lit(false))) && cd)
          case None => None // unconditional update shadows the delete
        }
        (u.assignments, cu, dw)
      case Seq(d: DeleteAction, u: UpdateAction) =>
        // delete first: the engine applies doomed before set, which
        // is exactly this order — pass both through
        (u.assignments, u.condition.map(toCol),
          Some(d.condition.map(toCol).getOrElse(lit(true))))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN clause combination (${other.map(_.getClass.getSimpleName)
          .mkString(", ")}) — at most one UPDATE and one DELETE per match group")
    }

  final case class GraftDeleteCommand(
      root: String, condition: Expression, targetOut: Seq[Attribute])
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val tIds = targetOut.map(_.exprId.id).toSet
      val cond = toColumn(condition, tIds, Set.empty)
      Txn.retry(root) { _ =>
        Updates.deleteRewritePublished(session, root, cond)._1
      }: Unit
      Seq.empty
    }
  }

  final case class GraftUpdateCommand(
      root: String, assignments: Seq[Assignment],
      condition: Option[Expression], targetOut: Seq[Attribute])
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val tIds = targetOut.map(_.exprId.id).toSet
      val set = assignments.map(a =>
        assignName(a) -> toColumn(a.value, tIds, Set.empty)).toMap
      val cond = condition.map(toColumn(_, tIds, Set.empty)).getOrElse(lit(true))
      Txn.retry(root) { _ =>
        Updates.updatePublished(session, root, cond, set).version
      }: Unit
      Seq.empty
    }
  }

  final case class GraftMergeCommand(
      root: String,
      source: LogicalPlan,
      mergeCond: Expression,
      matched: Seq[MergeAction],
      notMatched: Seq[MergeAction],
      bySource: Seq[MergeAction],
      targetOut: Seq[Attribute])
    extends LeafRunnableCommand {

    private def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }

    override def run(session: SparkSession): Seq[Row] = {
      val tIds = targetOut.map(_.exprId.id).toSet
      val sIds = source.output.map(_.exprId.id).toSet
      val joinCtx = (e: Expression) => toColumn(e, tIds, sIds)
      val srcCtx = (e: Expression) => toColumn(e, tIds, sIds, sourceAsPlain = true)

      // ON condition → equi-key pairs (targetName, sourceName); the
      // operators' keyed-join contract — theta merge conditions refuse
      val keyPairs: Seq[(String, String)] = conjuncts(mergeCond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if tIds.contains(a.exprId.id) && sIds.contains(b.exprId.id) =>
          (a.name, b.name)
        case EqualTo(b: AttributeReference, a: AttributeReference)
            if tIds.contains(a.exprId.id) && sIds.contains(b.exprId.id) =>
          (a.name, b.name)
        case other => throw new UnsupportedOperationException(
          s"MERGE ON must be a conjunction of target=source column " +
            s"equalities, got: ${other.sql}")
      }

      // the source as a DataFrame with every merge key present under
      // its TARGET name (the operators' same-name key contract)
      val sourceDf = SqlInternals.ofRows(session, source)
      val srcNames = source.output.map(_.name).toSet
      val mergeSource = keyPairs.foldLeft(sourceDf) { case (df, (tName, sName)) =>
        if (tName == sName) df
        else {
          refuse(srcNames.contains(tName),
            s"source column '$tName' collides with the target key name " +
              s"— alias it away in the USING clause")
          df.withColumn(tName, col(sName))
        }
      }
      val keys = keyPairs.map(_._1)

      // WHEN MATCHED → (set, deleteWhen); a conditional update gates
      // each SET value (unmatched-by-condition rows keep their own)
      val (mAssigns, mGate, deleteWhen) = foldGroup(matched, joinCtx)
      val set = mAssigns.map { a =>
        val name = assignName(a)
        val v = joinCtx(a.value)
        name -> mGate.fold(v)(g => when(g, v).otherwise(col(name)))
      }.toMap

      // WHEN NOT MATCHED → insert values over the PLAIN source; NO
      // insert clause means unmatched source rows do NOTHING (the SQL
      // contract — the API default of insert-all is the Scala-side
      // convenience), encoded as a never-true gate + empty values so
      // the projection resolves on any source width
      val (insertWhen, insertValues) = notMatched match {
        case Seq() => (Some(lit(false)), Some(Map.empty[String, Column]))
        case Seq(i: InsertAction) =>
          (i.condition.map(srcCtx),
            Some(i.assignments.map(a => assignName(a) -> srcCtx(a.value)).toMap))
        case other => throw new UnsupportedOperationException(
          s"exactly one WHEN NOT MATCHED THEN INSERT clause is supported, " +
            s"got ${other.size}")
      }

      // WHEN NOT MATCHED BY SOURCE → the full-sync branches;
      // conditions are target-only by construction
      val bsCtx = (e: Expression) => targetOnly(e, tIds, sIds)
      val (bsAssigns, bsGate, bsDelete) = foldGroup(bySource, bsCtx)
      val bySourceSet = bsAssigns.map(a => assignName(a) -> bsCtx(a.value)).toMap

      Txn.retry(root) { _ =>
        Merge.mergeIntoPublished(session, root, mergeSource,
          keys = keys,
          set = set,
          deleteWhen = deleteWhen,
          insertWhen = insertWhen,
          insertValues = insertValues,
          bySourceDeleteWhen = bsDelete,
          bySourceSet = bySourceSet,
          bySourceSetWhen = bsGate).version
      }: Unit
      Seq.empty
    }
  }
}

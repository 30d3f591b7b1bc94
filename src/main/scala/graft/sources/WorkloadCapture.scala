package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.util.QueryExecutionListener

/** OBSERVED-workload capture for the layout advisor — closes the
  * advise→measure loop over what users actually run instead of a
  * hand-declared workload ([[LayoutAdvisor.reclusterAdvice]]'s other
  * input half; the reference's pipelines hard-code their scan
  * predicates in SQL — e.g. the per-batch equality rebuild window at
  * reference/cloud_functions/core_coin_wallet_profits/
  * core_coin_wallet_profits.py:700 — here the engine RECORDS them
  * from the plans users actually run).
  *
  * A [[QueryExecutionListener]] that, per successful execution,
  * inspects the OPTIMIZED plan's `Filter` directly over a scan of
  * `tablePath` and folds its conjuncts into `(query_id, dim, lo, hi)`
  * rows — exactly [[LayoutAdvisor.reclusterAdvice]]'s workload shape:
  *
  *   - `a BETWEEN lo AND hi` (the DataFrame `between` desugaring
  *     `a >= lo AND a <= hi`), one-sided bounds, `=` (lo = hi), and
  *     strict bounds on integral dims (`<` / `>` close by ±1 — the
  *     integer-dim contract reclusterAdvice already has);
  *   - per execution, multiple conjuncts on one dim intersect
  *     (max of lows, min of highs); dims without any captured bound
  *     contribute nothing (an unpredicated dim is advise()'s "reads
  *     everything" case, represented by absence);
  *   - conjuncts that are not recognizable ranges on a declared dim
  *     (IsNotNull, OR trees, UDF-ish residuals) are skipped — capture
  *     UNDER-approximates, which for advice means a layout is never
  *     credited with selectivity the real workload doesn't have.
  *
  * Driver-side and O(plan) per query: the listener reads plan nodes,
  * never data. The event bus delivers asynchronously, so readers
  * rendezvous via [[awaitCount]] (bounded poll) before consuming
  * [[capturedWorkload]]. At 100 TB the capture cost is unchanged —
  * it's the QUERIES that are big, not their predicate lists; the
  * captured table stays |queries|·|dims|-sized and feeds the same
  * manifest arithmetic q162 gates. */
final class WorkloadCapture(tablePath: String, dims: Seq[(String, String)])
    extends QueryExecutionListener {

  private val dimByCol: Map[String, String] = dims.map { case (d, c) => c -> d }.toMap
  private val nextId = new AtomicLong(0L)
  private val rows = new ArrayBuffer[(Long, String, Long, Long)]
  private val targetPath = new java.io.File(tablePath).getAbsolutePath

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    // one query_id per SCAN LEG: a self-join reads the target twice
    // with independent predicates — two observed accesses, never one
    // intersected (possibly impossible) box
    val legs = WorkloadCapture.extract(qe.optimizedPlan, targetPath, dimByCol)
    legs.foreach { captured =>
      if (captured.nonEmpty) {
        val qid = nextId.incrementAndGet()
        rows.synchronized { captured.foreach { case (d, lo, hi) => rows += ((qid, d, lo, hi)) } }
      }
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()

  /** Snapshot of the captured workload, reclusterAdvice-shaped. */
  def capturedWorkload: Seq[(Long, String, Long, Long)] =
    rows.synchronized { rows.toSeq }

  def clear(): Unit = {
    rows.synchronized { rows.clear() }
    nextId.set(0L)
  }

  /** Bounded rendezvous with the async listener bus: true once at
    * least `n` distinct queries have been captured. */
  def awaitCount(n: Long, timeoutMs: Long = 30000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (nextId.get() >= n) return true
      Thread.sleep(25L)
    }
    nextId.get() >= n
  }
}

object WorkloadCapture {

  /** Pure extraction: the `(dim, lo, hi)` ranges each Filter-over-scan
    * of the target implies — ONE box set per Filter instance, so a
    * self-join scanning the target twice with disjoint ranges yields
    * two independent legs instead of intersecting into an impossible
    * lo>hi box. Conjuncts on one dim WITHIN a leg still intersect;
    * an intersection that comes up empty (contradictory conjuncts —
    * the leg matches nothing on that dim) is dropped rather than
    * recorded as a negative-width range the advisor's selectivity
    * arithmetic would misread. Public seam so the listener's plan
    * walking is testable without the event bus. */
  def extract(
      plan: LogicalPlan,
      targetPath: String,
      dimByCol: Map[String, String]): Seq[Seq[(String, Long, Long)]] = {
    val legs = ArrayBuffer.empty[Seq[(String, Long, Long)]]
    plan.foreach {
      case Filter(cond, child) if scansTarget(child, targetPath) =>
        val bounds = scala.collection.mutable.Map.empty[String, (Long, Long)]
        conjuncts(cond).foreach { e =>
          rangeOf(e, dimByCol).foreach { case (d, lo, hi) =>
            val (plo, phi) = bounds.getOrElse(d, (Long.MinValue, Long.MaxValue))
            bounds(d) = (math.max(plo, lo), math.min(phi, hi))
          }
        }
        val boxes = bounds.toSeq.sortBy(_._1)
          .collect { case (d, (lo, hi)) if lo <= hi => (d, lo, hi) }
        if (boxes.nonEmpty) legs += boxes
      case _ => ()
    }
    legs.toSeq
  }

  /** The Filter's child must scan the target table and nothing else —
    * a filter above a join is not a scan predicate. */
  private def scansTarget(plan: LogicalPlan, targetPath: String): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.exists(_.toUri.getPath == targetPath)
      case _ => false
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def attrDim(e: Expression, dimByCol: Map[String, String]): Option[String] =
    e match {
      case a: AttributeReference => dimByCol.get(a.name)
      case c: Cast => attrDim(c.child, dimByCol)
      case _ => None
    }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Byte, _) => Some(v.toLong)
    case _ => None
  }

  /** One conjunct → a closed integer range on a declared dim, when it
    * is one. Strict bounds close by ±1; guards keep the boundary
    * literals from wrapping. */
  private def rangeOf(
      e: Expression,
      dimByCol: Map[String, String]): Option[(String, Long, Long)] = {
    def mk(a: Expression, lo: Option[Long], hi: Option[Long]) =
      attrDim(a, dimByCol).map(d =>
        (d, lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue)))
    e match {
      case GreaterThanOrEqual(a, v) if litLong(v).isDefined => mk(a, litLong(v), None)
      case LessThanOrEqual(a, v) if litLong(v).isDefined => mk(a, None, litLong(v))
      case GreaterThan(a, v) if litLong(v).exists(_ < Long.MaxValue) =>
        mk(a, litLong(v).map(_ + 1), None)
      case LessThan(a, v) if litLong(v).exists(_ > Long.MinValue) =>
        mk(a, None, litLong(v).map(_ - 1))
      case EqualTo(a, v) if litLong(v).isDefined && attrDim(a, dimByCol).isDefined =>
        mk(a, litLong(v), litLong(v))
      case EqualTo(v, a) if litLong(v).isDefined => mk(a, litLong(v), litLong(v))
      case EqualNullSafe(a, v) if litLong(v).isDefined && attrDim(a, dimByCol).isDefined =>
        mk(a, litLong(v), litLong(v))
      case EqualNullSafe(v, a) if litLong(v).isDefined => mk(a, litLong(v), litLong(v))
      // an IN-list is a DISJUNCTION the advisor's per-dim conjunctive
      // interval algebra cannot hold, so it captures as its COVERING
      // box [min, max] — an over-approximation of the matched rows,
      // which under-credits the layout's selectivity: conservative in
      // the same direction as skipping the conjunct, but tighter
      case In(a, vs) if vs.nonEmpty && vs.forall(litLong(_).isDefined) =>
        val ls = vs.flatMap(litLong)
        mk(a, Some(ls.min), Some(ls.max))
      case InSet(a, set) if set.nonEmpty && set.forall(_.isInstanceOf[java.lang.Number]) =>
        val ls = set.toSeq.map(_.asInstanceOf[java.lang.Number].longValue())
        mk(a, Some(ls.min), Some(ls.max))
      case GreaterThanOrEqual(v, a) if litLong(v).isDefined && attrDim(a, dimByCol).isDefined =>
        mk(a, None, litLong(v)) // lit >= a  ⇔  a <= lit
      case LessThanOrEqual(v, a) if litLong(v).isDefined && attrDim(a, dimByCol).isDefined =>
        mk(a, litLong(v), None)
      case GreaterThan(v, a) if litLong(v).exists(_ > Long.MinValue) && attrDim(a, dimByCol).isDefined =>
        mk(a, None, litLong(v).map(_ - 1)) // lit > a  ⇔  a <= lit − 1
      case LessThan(v, a) if litLong(v).exists(_ < Long.MaxValue) && attrDim(a, dimByCol).isDefined =>
        mk(a, litLong(v).map(_ + 1), None)
      case _ => None
    }
  }
}

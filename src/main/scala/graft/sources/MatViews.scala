package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Materialized-aggregate-view registry — the metadata side of
  * automatic view matching ([[graft.plans.ViewMatchRewrite]]).
  *
  * A registered view asserts: "the parquet table at `mvPath` holds
  * `SELECT groupCols, sum(e_i) AS s_i…, count(*) AS cnt, min/max(…)
  * FROM sourcePath GROUP BY groupCols`, and it is CURRENT." The
  * rewrite rule then answers any aggregate whose grouping is a subset
  * of `groupCols`, whose filters touch only `groupCols`, and whose
  * measures are derivable from the registered ones — without ever
  * scanning the facts. Keeping the view current is the registrant's
  * contract, and graft already ships both halves of it:
  * [[graft.streaming.AggTableSink]] maintains exactly this table
  * shape incrementally from an append-only stream (batch id inside
  * the atomic publish), and [[build]] is the batch (re)build.
  *
  * Measures are matched STRUCTURALLY: at registration each measure's
  * defining expression is resolved against the source schema and
  * stored as its canonical SQL string; at match time the query's
  * aggregate argument is printed the same way and compared. That
  * makes `sum(CAST(round(value, 6) AS DECIMAL(18,6)))` in a query
  * find the `sum_v` column registered with the same expression, while
  * `sum(value)` (a DIFFERENT aggregate) correctly misses.
  *
  * Exactness of the compensation algebra: sum-of-group-sums ≡ the
  * direct sum only when addition is associative-and-exact — DECIMAL
  * or integral measures, the repo's standard posture (a double sum
  * would drift by accumulation order and could not sit under the
  * hash gate). min/max are idempotent-semigroup measures (exact for
  * any type), count compensates as sum-of-counts.
  *
  * Scale: this is the 100 TB dashboard story — the facts are scanned
  * once per maintenance tick (or never, streaming); every matching
  * rollup/slice query thereafter reads a |groups|-row table. The
  * registry itself is driver-side metadata (a handful of strings per
  * view).
  */
object MatViews {

  /** What the rewrite rule needs from any registered view, single-
    * table or join-rooted: where the table lives, its grain, and the
    * measure catalog (mv column -> canonical defining SQL). */
  sealed trait ViewMeasures {
    def mvPath: String
    def groupCols: Seq[String]
    def sums: Map[String, String]
    def countCol: Option[String]
    def mins: Map[String, String]
    def maxs: Map[String, String]
    def publish: Boolean
  }

  /** One registered view over one source table. */
  final case class MvDef(
      sourcePath: String,
      mvPath: String,
      groupCols: Seq[String],
      /** mv column name -> canonical SQL of the summed expression */
      sums: Map[String, String],
      /** mv column holding count(*), if materialized */
      countCol: Option[String],
      /** mv column name -> canonical SQL of the min'd expression */
      mins: Map[String, String],
      /** mv column name -> canonical SQL of the max'd expression */
      maxs: Map[String, String],
      /** true when `mvPath` is a [[Publish]] root (e.g. an
        * [[graft.streaming.AggTableSink]]-maintained table): reads
        * resolve the CURRENT version at rewrite time, so a matched
        * query always answers at the latest committed tick — the
        * continuous-MV loop. */
      publish: Boolean = false) extends ViewMeasures

  /** One registered view over an inner equi-join of two tables (the
    * star-schema rollup: facts ⋈ dim pre-joined and pre-aggregated).
    * `leftKeys(i)` joins to `rightKeys(i)`; every non-key column name
    * must be unique across the two inputs so grain columns and
    * measure SQL resolve unambiguously. */
  final case class JoinMvDef(
      leftPath: String,
      rightPath: String,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, String],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      publish: Boolean = false) extends ViewMeasures

  private val registry = TrieMap.empty[String, MvDef]

  private[graft] def normalize(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath

  /** Canonical SQL for `expr` resolved against the source schema —
    * the string both registration and the rewrite rule compare. */
  private[graft] def canonicalSql(
      spark: SparkSession, sourcePath: String, c: Column): String =
    canon(resolvedExpr(spark, sourcePath, c))

  /** Qualifier-free SQL print — a query resolving the same column
    * through a view alias must produce the same string. */
  private[graft] def canon(e: Expression): String =
    e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.withQualifier(Seq.empty)
    }.sql

  // resolved AND optimizer-normalized (constant folding, cast
  // simplification) — the rewrite rule runs pre-CBO, so the query
  // expressions it compares against have been through the same
  // normalization
  private def resolvedExpr(
      spark: SparkSession, sourcePath: String, c: Column): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    spark.read.parquet(sourcePath).select(c.as("__m"))
      .queryExecution.optimizedPlan match {
      case Project(Seq(Alias(e, _)), _) => e
      case p => p.expressions.head
    }
  }

  /** Build the view's table: one aggregation pass over the source,
    * written to `mvPath` (overwrite). Returns the registered def. */
  def build(
      spark: SparkSession,
      sourcePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, Column] = Map.empty,
      countCol: Option[String] = Some("cnt"),
      mins: Map[String, Column] = Map.empty,
      maxs: Map[String, Column] = Map.empty): MvDef = {
    require(groupCols.nonEmpty, "grouped views only")
    val aggs =
      sums.map { case (n, c) => sum(c).as(n) } ++
        countCol.map(n => count(lit(1)).as(n)) ++
        mins.map { case (n, c) => min(c).as(n) } ++
        maxs.map { case (n, c) => max(c).as(n) }
    require(aggs.nonEmpty, "a view needs at least one measure")
    spark.read.parquet(sourcePath)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail.toSeq: _*)
      .write.mode("overwrite").parquet(mvPath)
    register(spark, sourcePath, mvPath, groupCols, sums, countCol, mins, maxs)
  }

  /** Register an EXISTING view table (e.g. one
    * [[graft.streaming.AggTableSink]] maintains). Asserting currency
    * is the caller's contract. */
  def register(
      spark: SparkSession,
      sourcePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, Column] = Map.empty,
      countCol: Option[String] = Some("cnt"),
      mins: Map[String, Column] = Map.empty,
      maxs: Map[String, Column] = Map.empty,
      publish: Boolean = false): MvDef = {
    val d = MvDef(
      normalize(sourcePath), mvPath, groupCols,
      sums.map { case (n, c) => n -> canonicalSql(spark, sourcePath, c) },
      countCol,
      mins.map { case (n, c) => n -> canonicalSql(spark, sourcePath, c) },
      maxs.map { case (n, c) => n -> canonicalSql(spark, sourcePath, c) },
      publish)
    registry.put(d.sourcePath, d): Unit
    d
  }

  def lookup(sourcePath: String): Option[MvDef] =
    registry.get(normalize(sourcePath))

  def deregister(sourcePath: String): Unit =
    registry.remove(normalize(sourcePath)): Unit

  // ---- join views -------------------------------------------------

  private val joinRegistry = TrieMap.empty[(String, String), JoinMvDef]

  private def joined(
      spark: SparkSession,
      leftPath: String, rightPath: String,
      leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame = {
    val l = spark.read.parquet(leftPath)
    val r = spark.read.parquet(rightPath)
    val cond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _)
    l.join(r, cond)
  }

  /** Canonical SQL for a measure over the JOINED schema. */
  private def canonicalJoinSql(
      spark: SparkSession,
      leftPath: String, rightPath: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      c: Column): String = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    joined(spark, leftPath, rightPath, leftKeys, rightKeys)
      .select(c.as("__m")).queryExecution.optimizedPlan match {
      case Project(Seq(Alias(e, _)), _) => canon(e)
      case p => canon(p.expressions.head)
    }
  }

  /** Build a join view's table: one pass over facts ⋈ dim, written
    * to `mvPath` (overwrite), then registered. */
  def buildJoin(
      spark: SparkSession,
      leftPath: String, rightPath: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, Column] = Map.empty,
      countCol: Option[String] = Some("cnt"),
      mins: Map[String, Column] = Map.empty,
      maxs: Map[String, Column] = Map.empty): JoinMvDef = {
    require(groupCols.nonEmpty, "grouped views only")
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
    val aggs =
      sums.map { case (n, c) => sum(c).as(n) } ++
        countCol.map(n => count(lit(1)).as(n)) ++
        mins.map { case (n, c) => min(c).as(n) } ++
        maxs.map { case (n, c) => max(c).as(n) }
    require(aggs.nonEmpty, "a view needs at least one measure")
    joined(spark, leftPath, rightPath, leftKeys, rightKeys)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail.toSeq: _*)
      .write.mode("overwrite").parquet(mvPath)
    registerJoin(spark, leftPath, rightPath, leftKeys, rightKeys, mvPath,
      groupCols, sums, countCol, mins, maxs)
  }

  /** Register an EXISTING join-view table. */
  def registerJoin(
      spark: SparkSession,
      leftPath: String, rightPath: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, Column] = Map.empty,
      countCol: Option[String] = Some("cnt"),
      mins: Map[String, Column] = Map.empty,
      maxs: Map[String, Column] = Map.empty,
      publish: Boolean = false): JoinMvDef = {
    def canonM(m: Map[String, Column]) = m.map { case (n, c) =>
      n -> canonicalJoinSql(spark, leftPath, rightPath, leftKeys, rightKeys, c)
    }
    val d = JoinMvDef(
      normalize(leftPath), normalize(rightPath), leftKeys, rightKeys,
      mvPath, groupCols, canonM(sums), countCol, canonM(mins), canonM(maxs),
      publish)
    joinRegistry.put((d.leftPath, d.rightPath), d): Unit
    d
  }

  /** Join views registered for this (unordered) pair of paths. */
  def lookupJoin(pathA: String, pathB: String): Option[(JoinMvDef, Boolean)] = {
    val (a, b) = (normalize(pathA), normalize(pathB))
    joinRegistry.get((a, b)).map((_, false))
      .orElse(joinRegistry.get((b, a)).map((_, true)))
  }

  def deregisterJoin(leftPath: String, rightPath: String): Unit =
    joinRegistry.remove((normalize(leftPath), normalize(rightPath))): Unit
}

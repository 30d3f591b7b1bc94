package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join — each probe row matched to the
  * most recent quote row at-or-before its time, per key.
  *
  * This is the price-lookup shape of the reference's profits pipeline
  * (core_coin_wallet_profits.py:349-478 imputes a price for transfer
  * rows that precede the first quote; a live pipeline does the same
  * lookup against a sparse quote series), generalized to the classic
  * time-series operator Spark lacks natively.
  *
  * The plan is the union+running-window form, not a range join:
  * tag both sides, union them, and take `last(quote_payload,
  * ignoreNulls)` over (PARTITION BY keys ORDER BY time, side) with an
  * unbounded-preceding frame. That is ONE hash shuffle on the key —
  * identical shuffle volume to the sort-merge join of the two inputs —
  * with no per-key loop, no range explosion, and no driver
  * materialization, so it survives a 100× scale-up exactly as well as
  * any keyed window. A range-condition theta join (`probes JOIN quotes
  * ON key AND qt <= pt` + max-per-probe) degrades to
  * BroadcastNestedLoop or a per-key cross product when quote series
  * are long; the union form's cost stays n·log(run length) per
  * partition.
  *
  * Quote ties: at most one quote row per (keys, quoteTime) is the
  * documented contract (a quote SERIES); when violated, the
  * lexicographically greatest payload wins deterministically (the
  * window also orders by the payload struct), so results never depend
  * on partition iteration order.
  *
  * NULL keys follow equi-join semantics: `Window.partitionBy` groups
  * NULLs into one partition, which would let a NULL-keyed probe match
  * a NULL-keyed quote — DuckDB's ASOF JOIN (and any equi-join) never
  * matches NULL keys. NULL-keyed quote rows are therefore dropped
  * before the union; NULL-keyed probes still pass through with a null
  * match, preserving probe cardinality.
  */
object AsOfJoin {

  /** Backward-inclusive as-of join.
    *
    * @param probes     left side; ALL its columns pass through
    * @param quotes     right side; only `keys`, `quoteTime`, `payload`
    *                   are read
    * @param keys       equi-join key columns (same names both sides)
    * @param probeTime  probe-side event time column
    * @param quoteTime  quote-side time column (same or comparable type);
    *                   emitted on matches, null otherwise. Must not
    *                   collide with a probe column name.
    * @param payload    quote-side value columns carried to the output
    * @param maxGapDays optional tolerance: a match older than this many
    *                   days before the probe is nulled out (datediff
    *                   semantics — works for date and timestamp)
    */
  def asOf(
      probes: DataFrame,
      quotes: DataFrame,
      keys: Seq[String],
      probeTime: String,
      quoteTime: String,
      payload: Seq[String],
      maxGapDays: Option[Int] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi key")
    require(!probes.columns.contains(quoteTime),
      s"quote time column '$quoteTime' collides with a probe column — rename one side")

    val qStruct = struct((quoteTime +: payload).map(col): _*)
    val qType = quotes.select(qStruct).schema.head.dataType

    // probe payload rides the union as ONE struct — no second join to
    // reattach it after the window
    val pStruct = struct(probes.columns.map(col): _*)

    val taggedQuotes = quotes
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
      keys.map(col) ++ Seq(
        col(quoteTime).as("__t"),
        lit(1).as("__side"),
        qStruct.as("__q"),
        lit(null).cast(probes.select(pStruct).schema.head.dataType).as("__p")): _*)
    val taggedProbes = probes.select(
      keys.map(col) ++ Seq(
        col(probeTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(qType).as("__q"),
        pStruct.as("__p")): _*)

    // quotes sort BEFORE probes at equal time (backward-INCLUSIVE);
    // __q last so duplicate quotes resolve to the greatest payload
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__q").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedQuotes
      .unionByName(taggedProbes)
      .withColumn("__m", last(col("__q"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)

    val withinGap = maxGapDays match {
      case Some(d) =>
        when(datediff(col("__t"), col("__m")(quoteTime)) <= d, col("__m"))
      case None => col("__m")
    }
    val out = matched.withColumn("__m", withinGap)

    val probeCols = probes.columns.map(c => col("__p")(c).as(c))
    val quoteCols = (quoteTime +: payload).map(c => col("__m")(c).as(c))
    out.select(probeCols ++ quoteCols: _*)
  }

  /** Forward-inclusive as-of join — each probe matched to the
    * EARLIEST quote at-or-after its time, per key (the delivery/
    * next-quote direction pandas calls `merge_asof(direction=
    * "forward")`).
    *
    * Implemented as the time-reversal identity: forward as-of on t ≡
    * backward as-of on −t. Dates/timestamps negate through
    * `unix_date`/`unix_micros` (order-isomorphic, no precision loss);
    * numerics negate directly. The negated axis exists only inside
    * this call — emitted quote columns are the originals riding the
    * payload struct, so the public contract mirrors [[asOf]] exactly.
    * Same single-shuffle plan, same NULL-key and tie semantics
    * (greatest payload at an equal quote time wins on the reversed
    * axis too, keeping results partition-order-independent).
    *
    * @param maxGapDays matches farther than this many days AFTER the
    *                   probe are nulled out. Requires date/timestamp
    *                   time axes (datediff semantics — for timestamp
    *                   axes the gap is measured in CALENDAR-DAY
    *                   truncation, so 23:59 → 00:01 next day counts as
    *                   one day); numeric axes must pass None and
    *                   filter on their own units
    */
  def asOfForward(
      probes: DataFrame,
      quotes: DataFrame,
      keys: Seq[String],
      probeTime: String,
      quoteTime: String,
      payload: Seq[String],
      maxGapDays: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types._
    def negate(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case DateType => -unix_date(col(c))
      case TimestampType => -unix_micros(col(c))
      case _: NumericType => -col(c)
      case dt => throw new IllegalArgumentException(
        s"asOfForward cannot reverse a $dt time axis (column '$c')")
    }
    require(!(probes.columns ++ quotes.columns).exists(Set("__fwd_t", "__fwd_t2")),
      "columns '__fwd_t'/'__fwd_t2' are reserved by asOfForward")
    // the inner asOf joins on the reversed axis, so ITS collision
    // guard never sees the real quote-time name — re-assert it here
    // or a probe column named like quoteTime silently duplicates in
    // the output (the exact failure the backward guard prevents)
    require(!probes.columns.contains(quoteTime),
      s"quote time column '$quoteTime' collides with a probe column — rename one side")
    // fail HERE, not deep in the gap filter: datediff over a numeric
    // axis analyzes to an unrelated cast error far from the call site
    if (maxGapDays.isDefined) {
      def dayGrained(df: DataFrame, c: String) = df.schema(c).dataType match {
        case DateType | TimestampType => true
        case _ => false
      }
      require(dayGrained(probes, probeTime) && dayGrained(quotes, quoteTime),
        s"maxGapDays needs date/timestamp time axes ('$probeTime'/'$quoteTime'); " +
          "for a numeric axis filter the gap in its own units after the join")
    }

    val p2 = probes.withColumn("__fwd_t", negate(probes, probeTime))
    val q2 = quotes.withColumn("__fwd_t2", negate(quotes, quoteTime))
    // the ORIGINAL quote time rides as payload; the reversed axis is
    // the join time and is dropped before returning
    val joined = asOf(p2, q2, keys, "__fwd_t", "__fwd_t2",
      quoteTime +: payload, maxGapDays = None)

    val gapFiltered = maxGapDays match {
      case Some(d) =>
        // materialize the flag BEFORE nulling: the fold nulls
        // quoteTime first, and a flag re-reading it would evaluate
        // null (-> "not too far") for every later payload column
        val flagged = joined.withColumn("__toofar",
          datediff(col(quoteTime), col(probeTime)) > d)
        (quoteTime +: payload).foldLeft(flagged) { (df, c) =>
          df.withColumn(c, when(col("__toofar"), lit(null)).otherwise(col(c)))
        }.drop("__toofar")
      case None => joined
    }
    gapFiltered.drop("__fwd_t", "__fwd_t2")
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Quote-side input: a (key, event-time, payload) price tick. */
case class AsOfQuote(asset: Long, ts: java.sql.Timestamp, price: Double)

/** Probe-side input: the fact row to enrich. */
case class AsOfProbe(asset: Long, ts: java.sql.Timestamp, probe_id: Long,
    qty: Double)

/** One enriched probe: the latest quote at-or-before its event time
  * (backward-INCLUSIVE, [[graft.operators.AsOfJoin.asOf]]'s rule), or
  * nulls when the key has no quote history yet. `quote_ts_us` is the
  * matched quote's event time in microseconds. */
case class AsOfPriced(asset: Long, ts: java.sql.Timestamp, probe_id: Long,
    qty: Double, quote_ts_us: Option[Long], price: Option[Double])

private[streaming] case class AsOfBuf(tsUs: Long, isQuote: Boolean, id: Long,
    qty: Double, price: Double)
private[streaming] case class AsOfState(
    carryTsUs: Long, carryPrice: Double, hasCarry: Boolean,
    buffer: Seq[AsOfBuf], lastEventUs: Long = Long.MinValue)

/** S33: streaming as-of enrichment — the stateful twin of q51's
  * backward as-of join (the pattern every live pricing/attribution
  * pipeline runs: enrich a fact stream with the latest dimension tick
  * at-or-before each fact).
  *
  * "Latest at-or-before" is an event-TIME claim and micro-batches
  * arrive in PROCESSING order, so a correct stream cannot price
  * eagerly: a quote with `quote.ts ≤ probe.ts` may still arrive after
  * the probe does. Both sides buffer per key; once the watermark
  * passes an event it is replayed in strict (ts, side, payload)
  * order — quotes before probes at equal time (inclusive), greater
  * payload last among same-timestamp quotes (the batch tie rule) —
  * so every probe prices exactly once, against exactly the quote
  * prefix that can no longer change: bit-equal to
  * [[graft.operators.AsOfJoin.asOf]] however the stream is chopped
  * (the spec's claim). An event-time timeout at the earliest buffered
  * event wakes idle keys so held probes settle without needing
  * another tick.
  *
  * State: the buffer holds only events inside the watermark lag; the
  * settled quote history COMPACTS to one carry (tsUs, price) per key —
  * the as-of fold is associative over "latest", so nothing older can
  * ever win. Per-key state is O(events in lag window) + O(1), held
  * for as long as the key may still receive probes — the honest cost
  * of as-of over an unbounded keyspace — unless `carryTtlUs` retires
  * idle keys ([[RunningBalanceTtl]]'s eviction posture built in: the
  * timeout doubles as the reclamation timer); `maxGapUs` mirrors the
  * batch operator's maxGapDays at the µs grain. At 100 TB-rate ingest the
  * alternative — re-joining each micro-batch against the quote
  * TABLE — re-reads the dimension every trigger; this keeps the
  * single relevant tick per key in the state store instead.
  */
object AsOfStream {

  /** @param maxGapUs  tolerance (the batch operator's maxGapDays at
    *                   the µs grain): a match older than this before
    *                   the probe emits as unpriced — stale ticks are
    *                   worse than none for a live pipeline
    * @param carryTtlUs evict a key's carry once the watermark runs
    *                   this far past its LAST event — state hygiene
    *                   for retiring keys (delisted assets, closed
    *                   accounts); a probe arriving after eviction
    *                   prices null, exactly as if the history were
    *                   gone — which, by the TTL contract, it is */
  def apply(
      quotes: Dataset[AsOfQuote],
      probes: Dataset[AsOfProbe],
      watermarkDelay: String = "1 hour",
      maxGapUs: Option[Long] = None,
      carryTtlUs: Option[Long] = None): Dataset[AsOfPriced] = {
    import org.apache.spark.sql.functions._
    import quotes.sparkSession.implicits._
    // tag with column ops and watermark the UNION: a typed map after
    // withWatermark re-serializes into fresh attributes and can drop
    // the event-time column's watermark metadata
    val q = quotes.toDF().select(col("asset"), col("ts"),
      lit(true).as("isQuote"), lit(0L).as("id"), lit(0.0).as("qty"), col("price"))
    val p = probes.toDF().select(col("asset"), col("ts"),
      lit(false).as("isQuote"), col("probe_id").as("id"), col("qty"),
      lit(0.0).as("price"))
    q.unionByName(p)
      .withWatermark("ts", watermarkDelay)
      .as[AsOfTagged]
      .groupByKey(_.asset)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(maxGapUs, carryTtlUs))
  }

  private def tsUs(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** One watermark step, API-agnostic: what prices, what stays
    * buffered, the advanced carry, and the next wake point. */
  private[streaming] final case class Advance(
      settled: List[AsOfPriced],
      hold: Seq[AsOfBuf],
      carry: Option[(Long, Double)],
      wakeUs: Option[Long])

  private[streaming] def advance(
      asset: Long,
      buffered: Seq[AsOfBuf],
      incoming: Seq[AsOfBuf],
      prevCarry: Option[(Long, Double)],
      cutoffUs: Long,
      maxGapUs: Option[Long] = None): Advance = {
    // quotes sort before probes at equal time (backward-inclusive);
    // same-timestamp quotes sort by payload so the GREATEST one is the
    // carry after the fold — the batch operator's documented tie rule
    val (ready, hold) = (buffered ++ incoming)
      .sortBy(b => (b.tsUs, if (b.isQuote) 0 else 1, b.price, b.id))
      .partition(_.tsUs < cutoffUs)

    var carry = prevCarry
    val settled = List.newBuilder[AsOfPriced]
    for (e <- ready) {
      if (e.isQuote) carry = Some((e.tsUs, e.price))
      else {
        // gap tolerance nulls the MATCH, not the probe: the row still
        // emits (probe cardinality preserved, the batch contract)
        val m = carry.filter { case (qts, _) =>
          maxGapUs.forall(g => e.tsUs - qts <= g) }
        settled += AsOfPriced(asset, toTs(e.tsUs), e.id, e.qty,
          m.map(_._1), m.map(_._2))
      }
    }
    Advance(settled.result(), hold, carry, hold.headOption.map(_.tsUs))
  }

  private[streaming] def update(maxGapUs: Option[Long], carryTtlUs: Option[Long])(
      asset: Long,
      rows: Iterator[AsOfTagged],
      state: GroupState[AsOfState]): Iterator[AsOfPriced] = {
    val prev = state.getOption
    val prevCarry = prev.filter(_.hasCarry).map(s => (s.carryTsUs, s.carryPrice))
    val incoming = rows.map(t =>
      AsOfBuf(tsUs(t.ts), t.isQuote, t.id, t.qty, t.price)).toSeq
    val cutoffUs = state.getCurrentWatermarkMs * 1000L
    val a = advance(asset, prev.map(_.buffer).getOrElse(Nil), incoming,
      prevCarry, cutoffUs, maxGapUs)

    // the key's event-time high point decides TTL eviction: once the
    // watermark runs carryTtl past it with nothing buffered, the key
    // has retired and its carry leaves the store
    val lastEventUs = (prev.map(_.lastEventUs).getOrElse(Long.MinValue) +:
      incoming.map(_.tsUs)).max
    val ttlExpired = carryTtlUs.exists(ttl =>
      a.hold.isEmpty && lastEventUs != Long.MinValue &&
        cutoffUs - lastEventUs > ttl)

    // the carry persists for the key's lifetime (a probe years later
    // still prices off the last tick) unless a TTL retires it — only
    // a carry-less, buffer-less (or retired) key leaves the store
    if ((a.hold.isEmpty && a.carry.isEmpty) || ttlExpired) {
      if (state.exists) state.remove()
    } else {
      state.update(AsOfState(
        a.carry.map(_._1).getOrElse(0L), a.carry.map(_._2).getOrElse(0.0),
        a.carry.isDefined, a.hold, lastEventUs))
      // wake at the earliest buffered event, or at the TTL deadline so
      // an idle key's carry is reclaimed without another tick
      val wake = (a.wakeUs.toSeq ++
        carryTtlUs.map(ttl => lastEventUs + ttl + 1L)).minOption
      wake.foreach { w =>
        state.setTimeoutTimestamp(
          math.max(w / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
      }
    }
    a.settled.iterator
  }
}

/** Internal union row for the two input sides. */
private[streaming] case class AsOfTagged(asset: Long, ts: java.sql.Timestamp,
    isQuote: Boolean, id: Long, qty: Double, price: Double)

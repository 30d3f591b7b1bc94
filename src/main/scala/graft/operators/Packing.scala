package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence PACKING — the step between curation and the training
  * loader: concatenate documents into fixed-budget training sequences
  * (context-window filling / "sample packing") so short documents
  * don't waste attention mass as padding.
  *
  * The policy is greedy NEXT-FIT in a deterministic order: within a
  * shard, documents arrive in (orderCol, idCol) order and accumulate
  * into the current sequence until the next document would overflow
  * the budget, which closes it and opens the next — an oversized
  * document gets a sequence of its own. Next-fit (vs first-fit) is
  * the deliberate choice: it is single-pass, ORDER-PRESERVING (a
  * curation pipeline that interleaved sources upstream keeps that
  * interleaving inside sequences), and exactly re-derivable by an
  * independent engine as a linear recurrence — the DuckDB oracle runs
  * it as a recursive CTE, so the assignment itself sits under the
  * hash gate. First-fit-decreasing packs ~10% denser but destroys
  * order and needs bin state, the wrong trade for training data.
  *
  * Scale shape: packing is sequential BY DEFINITION within a shard
  * (each decision depends on the running remainder), so the unit of
  * parallelism is the shard — one `repartition(shard)` shuffle, an
  * in-partition sort, and a single O(n) pass per shard. A 100 TB
  * corpus exports thousands of shards (q59's assignment scales shard
  * count with data), so the sequential pass is per-task-bounded, not
  * a driver loop; within a task it is a streaming fold over the
  * sorted iterator — no buffering beyond the running counters. */
object Packing {

  /** Assign every document a (shard-local) `seq_id` under greedy
    * next-fit.
    *
    * @param orderCol total order within the shard (ties broken by
    *   `idCol`) — the packing recurrence's input order
    * @param budget max summed `lenCol` per sequence; a document
    *   longer than the budget gets its own sequence
    * @return (shardCol, seq_id, idCol, lenCol) — seq_id starts at 1
    *   per shard */
  def packNextFit(
      docs: DataFrame,
      shardCol: String,
      orderCol: String,
      idCol: String,
      lenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col(shardCol).cast("long"), col(orderCol).cast("long"),
        col(idCol).cast("long"), col(lenCol).cast("long"))
      .as[(Long, Long, Long, Long)]
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(orderCol), col(idCol))
      .mapPartitions { it =>
        // several shards can share a task (hash collisions) — the
        // running state resets on every shard boundary, which the
        // in-partition sort makes well-defined; the boundary test is
        // an explicit first-row flag (a sentinel shard value would
        // collide with a shard legitimately keyed that value)
        var first = true
        var shard = 0L
        var acc = 0L
        var seq = 0L
        it.map { case (s, _, id, len) =>
          if (first || s != shard) { first = false; shard = s; seq = 1L; acc = len }
          else if (acc + len > budget) { seq += 1L; acc = len }
          else acc += len
          (s, seq, id, len)
        }
      }
      .toDF(shardCol, "seq_id", idCol, lenCol)
  }

  /** The loader-facing SEQUENCE INDEX over a packed corpus — one row
    * per (shard, sequence) with its document count, token total, and
    * the sequence's token START OFFSET within the shard, so a
    * training job SEEKS to sequence k of shard s without listing or
    * scanning the export (the file-manifest posture of
    * [[graft.sources.Export.manifest]] lifted to the token grain).
    *
    * Declarative all the way: the packing recurrence already decided
    * the bins, so the index is one aggregate over (shard, seq) plus
    * a windowed prefix sum over the sequences of each shard — index
    * rows ∝ sequences (corpus tokens / budget), shuffled on the same
    * shard key the packing already used. */
  def sequenceIndex(
      packed: DataFrame,
      shardCol: String,
      seqCol: String,
      lenCol: String): DataFrame = {
    val per = packed.groupBy(col(shardCol), col(seqCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(lenCol)).as("seq_tokens"))
    val w = Window.partitionBy(shardCol).orderBy(seqCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    per.withColumn("seq_start",
      coalesce(sum(col("seq_tokens")).over(w), lit(0L)))
  }
}

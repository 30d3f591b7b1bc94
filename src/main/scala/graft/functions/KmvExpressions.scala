package graft.functions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_kmv_agg(hash, k)`: the k smallest DISTINCT long hashes of a
  * group, as a sorted ascending array — a bounded-memory k-minimum-
  * values distinct-count sketch builder.
  *
  * Semantically identical to `slice(array_sort(collect_set(hash)), 1, k)`
  * (the form [[graft.sources.FileStats]] first shipped), but the
  * buffer is CAPPED at k entries: `collect_set` accumulates every
  * distinct hash per group before the slice truncates, so a
  * near-unique column passed as a kmv dimension risked executor OOM
  * at corpus scale — the r8 ADVICE item this aggregate closes. Here a
  * candidate enters the buffer only while it is among the k smallest
  * seen so far (a `TreeSet` capped by evicting its max), so per-group
  * state is O(k) regardless of the column's distinct count, and the
  * partial/merge path ships ≤ k longs per group at the shuffle.
  *
  * Determinism: the k smallest distinct values of a multiset are
  * order-independent, so partial aggregation, partition count, and
  * merge order cannot change the output bytes — the property that
  * lets manifests built from this sketch sit under the hash gate
  * (same posture as [[graft.similarity.Overlap]]'s KMV estimator,
  * whose hash space and estimator [[graft.sources.FileStats.ndvEstimate]]
  * reuses verbatim).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "graft_kmv_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def offer(b: JTreeSet[java.lang.Long], v: Long): Unit =
    if (b.size < k) { b.add(v); () }
    else if (v < b.last) {
      // strictly smaller than the current kth-smallest: swap it in
      if (b.add(v)) b.pollLast(): Unit
    }

  override def update(
      b: JTreeSet[java.lang.Long], row: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(row)
    if (v != null) offer(b, v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: JTreeSet[java.lang.Long],
      o: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg = copy(child = c.head)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable quantile sketches — the family Spark's built-ins lack.
  *
  * `percentile_approx` answers one query over one pass but exposes no
  * sketch: its summary cannot be STORED and re-merged, so a trailing-
  * window percentile re-scans the facts for every window. This module
  * completes the sketch-table posture (HLL: q56/q86/S17; count-min:
  * q82) for quantiles: `graft_kll_agg` collapses a value column to a
  * compact binary sketch, `graft_kll_merge_agg` unions stored
  * sketches, `graft_kll_quantiles` extracts quantiles — the exact
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate shape, for
  * ranks instead of cardinalities.
  *
  * The sketch is the uniform-capacity compactor scheme (Munro-
  * Paterson lineage, the structure KLL refines): level i holds items
  * of weight 2^i in a buffer of capacity k; a full buffer sorts,
  * promotes every other element to level i+1, and discards the rest —
  * total weight is preserved, so Σweights ≡ count. Rank error decays
  * as O(levels/k); the spec pins ≤2% observed rank error at k=256
  * against exact percentiles rather than leaning on constants.
  *
  * Compaction coins are DETERMINISTIC (hashed from (n, level, size)):
  * the textbook analysis wants random coins, but a data-engine wants
  * reproducible results — the same input chopped the same way yields
  * the same bytes. (Merge ORDER still varies with partitioning, so
  * cross-run estimates may differ within the error bound; within one
  * plan the results are stable.) This is a documented trade, same
  * posture as the stratified sampler's pure-hash predicate.
  *
  * All three functions are native Catalyst expressions (a
  * TypedImperativeAggregate pair + a scalar extractor), not UDFs/udaf
  * wrappers — aggregation buffers live as raw objects and serialize
  * only at shuffle boundaries.
  */
object Kll {

  /** Mutable compactor sketch. k must be even and ≥ 8. `k == 0`
    * marks an empty merge-buffer that adopts the first sketch's k. */
  final class Sketch(var k: Int) {
    var n: Long = 0L
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer.empty

    private def ensureLevel(i: Int): Unit =
      while (levels.length <= i) levels += ArrayBuffer.empty[Double]

    private def compactLevel(i: Int): Unit = {
      val arr = levels(i).toArray
      java.util.Arrays.sort(arr)
      ensureLevel(i + 1)
      val even = arr.length & ~1
      val coin =
        scala.util.hashing.MurmurHash3.productHash((n, i, arr.length)) & 1
      levels(i).clear()
      // odd leftover keeps its own weight at this level
      if (arr.length != even) levels(i) += arr(arr.length - 1)
      var j = coin
      while (j < even) { levels(i + 1) += arr(j); j += 2 }
      if (levels(i + 1).length >= k) compactLevel(i + 1)
    }

    def insert(x: Double): Unit = {
      ensureLevel(0)
      levels(0) += x
      n += 1
      if (levels(0).length >= k) compactLevel(0)
    }

    def mergeIn(o: Sketch): Unit = {
      if (o.k == 0 || o.n == 0) return
      if (k == 0) k = o.k
      require(o.k == k, s"cannot merge sketches with k=$k and k=${o.k}")
      n += o.n
      var i = 0
      while (i < o.levels.length) {
        ensureLevel(i)
        levels(i) ++= o.levels(i)
        i += 1
      }
      i = 0
      while (i < levels.length) {
        if (levels(i).length >= k) compactLevel(i)
        i += 1
      }
    }

    /** Quantile at each probability in `ps` (0 ≤ p ≤ 1): the smallest
      * retained value whose cumulative weight reaches p·n. NaN on an
      * empty sketch. */
    def quantiles(ps: Array[Double]): Array[Double] = {
      if (n == 0L) return ps.map(_ => Double.NaN)
      var m = 0
      levels.foreach(m += _.length)
      val vs = new Array[Double](m)
      val ws = new Array[Long](m)
      var idx = 0
      var lvl = 0
      while (lvl < levels.length) {
        val w = 1L << lvl
        val buf = levels(lvl)
        var j = 0
        while (j < buf.length) { vs(idx) = buf(j); ws(idx) = w; idx += 1; j += 1 }
        lvl += 1
      }
      // sort (value, weight) pairs by value
      val order = Array.range(0, m).sortBy(vs)
      ps.map { p =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        var cum = 0L
        var i = 0
        var out = vs(order(m - 1))
        var done = false
        while (i < m && !done) {
          cum += ws(order(i))
          if (cum >= target) { out = vs(order(i)); done = true }
          i += 1
        }
        out
      }
    }
  }

  def serialize(s: Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k)
    out.writeLong(s.n)
    out.writeInt(s.levels.length)
    s.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Sketch(in.readInt())
    s.n = in.readLong()
    val nLevels = in.readInt()
    var i = 0
    while (i < nLevels) {
      val len = in.readInt()
      val buf = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { buf += in.readDouble(); j += 1 }
      s.levels += buf
      i += 1
    }
    s
  }
}

/** Shared TypedImperativeAggregate plumbing for the two KLL
  * aggregates: object buffers in memory, [[Kll.serialize]] bytes at
  * shuffle boundaries, binary sketch out. */
abstract class KllAggBase extends TypedImperativeAggregate[Kll.Sketch] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def merge(b: Kll.Sketch, o: Kll.Sketch): Kll.Sketch = {
    b.mergeIn(o); b
  }
  override def eval(b: Kll.Sketch): Any = Kll.serialize(b)
  override def serialize(b: Kll.Sketch): Array[Byte] = Kll.serialize(b)
  override def deserialize(bytes: Array[Byte]): Kll.Sketch =
    Kll.deserialize(bytes)
}

/** `graft_kll_agg(value, k)`: build a quantile sketch from a double
  * column. NULLs contribute nothing, like every SQL aggregate. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {
  require(k >= 8 && k % 2 == 0, s"k must be even and >= 8, got $k")

  override def prettyName: String = "graft_kll_agg"
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): Kll.Sketch = new Kll.Sketch(k)
  override def update(b: Kll.Sketch, row: InternalRow): Kll.Sketch = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Number].doubleValue())
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllAgg = copy(child = c.head)
}

/** `graft_kll_merge_agg(sketch)`: union stored binary sketches — the
  * sketch-table read side. The buffer adopts the first sketch's k. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {
  override def prettyName: String = "graft_kll_merge_agg"
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): Kll.Sketch = new Kll.Sketch(0)
  override def update(b: Kll.Sketch, row: InternalRow): Kll.Sketch = {
    val v = child.eval(row)
    if (v != null) b.mergeIn(Kll.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c.head)
}

/** `graft_kll_quantiles(sketch, array(p…))`: extract quantiles from a
  * binary sketch. Scalar, runs on aggregated rows (one per group) —
  * interpreter cost is irrelevant there, so CodegenFallback. */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_kll_quantiles"

  override protected def nullSafeEval(sketch: Any, probs: Any): Any = {
    val s = Kll.deserialize(sketch.asInstanceOf[Array[Byte]])
    val ps = probs.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(s.quantiles(ps))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantiles =
    copy(left = newLeft, right = newRight)
}

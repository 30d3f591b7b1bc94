package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + probe as native expressions — the semi/anti
  * join accelerator Spark keeps to itself.
  *
  * Catalyst's own runtime-filter rewrite builds a
  * BloomFilterAggregate on a join's small side and injects a
  * might-contain predicate into the big side's scan, but both
  * expressions are internal and fire only when the optimizer elects
  * the rewrite for an equi-join. Operators like
  * [[graft.similarity.Dedup.decontaminateBloom]] want the same
  * machinery EXPLICITLY: build a filter over the benchmark side's
  * shingle hashes once, prune the corpus-side scan to
  * bloom-positive rows, and let the exact join that follows kill
  * the false positives — the filter changes shuffle mass, never
  * results, which is what keeps the operator oracle-able.
  *
  * `graft_bloom_agg(hash, expectedItems, fpp)` → binary filter
  * (`org.apache.spark.util.sketch.BloomFilter`, merged partial-wise
  * as a bitwise OR — order-insensitive, so the bytes are
  * engine-reproducible). `graft_bloom_contains(filterBytes, hash)` →
  * boolean; the filter argument must be FOLDABLE (a literal carrying
  * the built filter): it is deserialized once per executor and
  * referenced from generated code, so the probe inlines into the
  * scan's codegen stage as one `mightContainLong` call per row.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {
  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter, row: InternalRow): BloomFilter = {
    val v = child.eval(row)
    if (v != null) b.putLong(v.asInstanceOf[Number].longValue()): Unit
    b
  }

  // partials share (expectedItems, fpp) ⇒ identical geometry; the
  // merge is a bitwise OR, so any merge order yields the same bits
  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
    b.mergeInPlace(o): Unit
    b
  }

  override def eval(b: BloomFilter): Any = serialize(b)
  override def serialize(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomAgg = copy(child = c.head)
}

case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // deserialized once per executor (the expression ships with its
  // literal filter bytes; the lazy val rebuilds locally), then shared
  // by every row the task probes
  @transient private lazy val filter: BloomFilter = {
    require(left.foldable,
      s"$prettyName needs a foldable filter argument (a literal built " +
        "by graft_bloom_agg); got a per-row expression")
    val bytes = left.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override def eval(row: InternalRow): Any = {
    val v = right.eval(row)
    if (filter == null || v == null) null
    else filter.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      val rGen = right.genCode(ctx)
      ev.copy(code = code"""
        ${rGen.code}
        boolean ${ev.isNull} = ${rGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${rGen.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

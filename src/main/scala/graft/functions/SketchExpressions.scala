package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_probe(cms, keys)`: estimate counts for an array of long
  * keys against one serialized `count_min_sketch` aggregate — the
  * probe side Spark's sketch aggregate doesn't ship (it can BUILD a
  * sketch in SQL but only probe it on the JVM driver).
  *
  * Shaped for the distributed heavy-hitter probe
  * ([[graft.operators.TopK.countMinEstimates]]): the caller packs a
  * group's ≤k candidate keys into ONE array row, so the sketch —
  * ~eps⁻¹-wide, ~80 KB at eps=0.001 — is deserialized once per GROUP,
  * not once per candidate, and never leaves the executors.
  * CodegenFallback is deliberate: the expression runs on |groups|
  * rows post-aggregation, where the deserialization dominates and
  * codegen would buy nothing (contrast [[DotProduct]], which inlines
  * into an O(n²) join stage).
  */
case class CmsProbeAll(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_probe"

  override protected def nullSafeEval(cmsBytes: Any, keys: Any): Any = {
    val sketch = CountMinSketch.readFrom(cmsBytes.asInstanceOf[Array[Byte]])
    val ks = keys.asInstanceOf[ArrayData]
    val out = new Array[Long](ks.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = sketch.estimateCount(ks.getLong(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsProbeAll =
    copy(left = newLeft, right = newRight)
}

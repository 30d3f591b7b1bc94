package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(text)`: Unicode NFC normalization — the canonical
  * composition pass every text-cleanup pipeline runs first (e + U+0301
  * → é), which Spark's function library lacks entirely. A native
  * unary expression with codegen (one static `java.text.Normalizer`
  * call inlined into the scan stage — no UDF serialization, stays
  * inside WholeStageCodegen), chosen over a UDF for exactly the
  * reason [[DotProduct]] was: this runs once per document in the hot
  * corpus pass. Cross-engine twin: DuckDB's `nfc_normalize` — both
  * implement UAX #15 NFC, so normalized output is hash-gate
  * comparable. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

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

/** `graft_grams(text, buckets)`: hashed unigram+bigram bucket ids in
  * one native pass — the codegen'd replacement for q170's
  * higher-order-function chain (split → per-word char-fold aggregate →
  * zip_with bigrams → concat → pmod), which profiling showed dominates
  * the importance-reweighting scan (the carried "native expression
  * where HOFs dominate" item, finally measurement-proven). Semantics
  * are BIT-IDENTICAL to the HOF form and its DuckDB oracle: words
  * split on single spaces, empties dropped with bigram adjacency
  * surviving the drop, per-word hash = fold(codepoints)(acc·31 + cp)
  * mod 1e9+7 seeded at 7, bigram = (h₁·131 + h₂) mod p, bucket =
  * value mod `buckets` — one tight codepoint loop per document, no
  * per-word array allocation, inlined into WholeStageCodegen via a
  * static call. */
case class GramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "graft_grams needs a positive bucket count")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_grams"

  override protected def nullSafeEval(input: Any): Any =
    GramBuckets.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramBuckets.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

object GramBuckets {
  private val P = 1000000007L

  /** One pass over the document's code points: fold word hashes,
    * emit a unigram bucket per word and a bigram bucket per adjacent
    * pair (empties skipped, adjacency across the skip). */
  def compute(text: UTF8String, buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    val bis = new scala.collection.mutable.ArrayBuffer[Long](16)
    var prev = -1L
    var h = 7L
    var inWord = false
    var i = 0
    val n = s.length
    while (i <= n) {
      val atEnd = i == n
      val cp = if (atEnd) ' '.toInt else s.codePointAt(i)
      if (cp == ' '.toInt) {
        if (inWord) {
          out += java.lang.Math.floorMod(h, buckets.toLong)
          if (prev >= 0) bis += java.lang.Math.floorMod((prev * 131L + h) % P, buckets.toLong)
          prev = h
          h = 7L
          inWord = false
        }
        i += 1
      } else {
        h = (h * 31L + cp) % P
        inWord = true
        i += Character.charCount(cp)
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      (out ++ bis).toArray)
  }
}

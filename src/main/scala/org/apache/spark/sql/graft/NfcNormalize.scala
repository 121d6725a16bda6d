// Same namespace rationale as DotProduct.scala: the Column bridge
// (classic.ExpressionUtils) is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native NFC normalization (UAX #15) over a string column.
  *
  * The typed-map formulation (Dataset map over nfcForm) costs a
  * DeserializeToObject/SerializeFromObject pair that SPLITS
  * whole-stage codegen around the hottest scan in the curation
  * pipeline (t14/p01 normalize every document before any hashing).
  * As a unary Expression the call inlines into the generated stage:
  * the already-NFC fast path returns the INPUT UTF8String (no
  * decode, no re-encode, no allocation beyond isNormalized's scan),
  * and only genuinely decomposed text pays the JDK normalizer.
  * java.text.Normalizer implements the same UAX #15 tables DuckDB's
  * nfc_normalize does, so oracle parity is unchanged. Registered for
  * SQL users as `graft_nfc` via GraftExtensions.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** THE NFC kernel — one rule for the expression (interpreted +
    * codegen paths), the String form below, and through it the
    * operators' nfcForm. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** String-side form for JVM kernels (TextQueries.nfcForm delegates
    * here so plan-side and kernel-side normalization share one rule). */
  def nfcString(t: String): String =
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC)) t
    else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)

  /** Column wrapper for the DataFrame API. */
  def nfcCol(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}

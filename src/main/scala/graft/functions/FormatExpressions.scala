package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Decimal → unscaled big-endian bytes (`BinaryType`), at the column's
  * declared scale. Spark's JSON writer serializes binary as base64, so
  * projecting a decimal column through this expression reproduces the
  * reference's `json.decimal.format=BASE64` wire format (the Connect
  * JsonConverter encoding of Decimal: base64 of the unscaled value,
  * S3SinkConnectorConfig.java:214-219). */
case class DecimalUnscaledBytes(child: Expression)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = BinaryType

  private lazy val scale = child.dataType.asInstanceOf[DecimalType].scale

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decimal_unscaled_bytes requires decimal, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[org.apache.spark.sql.types.Decimal]
      .toJavaBigDecimal.setScale(scale).unscaledValue().toByteArray

  override protected def withNewChildInternal(c: Expression): DecimalUnscaledBytes =
    copy(child = c)
  override def prettyName: String = "decimal_unscaled_bytes"
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) via `java.text.Normalizer` —
  * Spark ships no normalizer builtin, and the composed-vs-decomposed split
  * silently defeats exact dedup and fingerprinting on crawled text ("é" as
  * U+00E9 vs e+U+0301 hash differently). Fast path: already-normalized
  * strings (the overwhelming majority of real corpora) pass through with a
  * single `isNormalized` scan and no re-encode. NFC matches DuckDB's
  * `nfc_normalize` (both implement the Unicode standard), so NFC pipelines
  * stay oracle-checkable. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = StringType

  private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (child.dataType, form) match {
      case (StringType, "NFC" | "NFD" | "NFKC" | "NFKD") =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (StringType, f) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got $f")
      case (other, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, normForm)) u.clone()
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, normForm))
  }

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
  override def prettyName: String = "unicode_normalize"
}

object FormatExpressions {
  import org.apache.spark.sql.graft.bridge

  def decimalUnscaledBytes(dec: Column): Column =
    bridge.column(DecimalUnscaledBytes(bridge.expression(dec)))

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    bridge.column(UnicodeNormalize(bridge.expression(text), form))
}

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

object FormatExpressions {
  import org.apache.spark.sql.graft.bridge

  def decimalUnscaledBytes(dec: Column): Column =
    bridge.column(DecimalUnscaledBytes(bridge.expression(dec)))
}

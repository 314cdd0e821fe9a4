package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression — the
  * entity-resolution scorer for NAME-shaped strings, where Levenshtein's
  * unit edit costs over-penalize transpositions (Winkler 1990, census
  * record linkage). Semantics match the engine-portable reference
  * implementation (also DuckDB's `jaro_winkler_similarity`, which the
  * oracle replays) exactly:
  *
  *  - match window `max(|a|,|b|)/2 - 1` (floored, can be 0 — `"ab"` vs
  *    `"ba"` scores 0 because nothing matches inside a 0 window);
  *  - transpositions = half the mismatched positions among matches;
  *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, with 0 when m = 0 — which
  *    also covers the empty-string cases (either empty → 0, BOTH empty
  *    → 0, the rapidfuzz convention, NOT the "1.0 for equal" one);
  *  - Winkler boost only when jaro > 0.7: jw = jaro + l·0.1·(1-jaro)
  *    over the common prefix l capped at 4.
  *
  * One pass over char arrays per pair, zero allocation beyond two small
  * bitmask arrays; `eval` and generated code share the same body (the
  * house reference-object codegen pattern), so interpreted and codegen
  * plans are bit-identical.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two strings, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val t = b.asInstanceOf[UTF8String].toString
    java.lang.Double.valueOf(JaroWinkler.similarity(s, t))
  }

  /** Public bridge for generated code (nullSafeEval is protected). */
  def compute(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftJw", this,
      classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ((java.lang.Double) $ref.compute($a, $b))" +
        ".doubleValue();")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  /** Column-API face: `JaroWinkler(col("a"), col("b"))`. */
  def apply(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.graft.bridge
    br.column(JaroWinkler(br.expression(a), br.expression(b)))
  }

  def similarity(s: String, t: String): Double = {
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sMatched = new Array[Boolean](ls)
    val tMatched = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true
          tMatched(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: mismatches among the matched chars in order
    var halfT = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - halfT / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(ls, lt))
    while (prefix < maxP && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

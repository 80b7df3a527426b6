package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused integer-milli cosine similarity over two `array<float>` columns —
  * the engine's one custom Catalyst `Expression` (SURVEY.md §4.2 #3:
  * native expression > custom Expression > UDF; this is the middle rung,
  * taken because the scoring loop is THE hot path of brute-force ANN).
  *
  * Replaces the three interpreted higher-order passes of the
  * `zip_with`/`aggregate` formulation (dot, |a|, |b|) with one fused loop,
  * and participates in whole-stage codegen via [[doGenCode]] so the loop
  * inlines into the generated stage with no per-row boxing or lambda
  * dispatch.
  *
  * Bit-compatibility contract: per accumulator the floating-point
  * operation sequence is identical to the interpreted form (left-to-right
  * double accumulation over float-to-double casts), so results are
  * bit-identical to both `VectorFns` and DuckDB's `list_dot_product` —
  * the cross-engine hash contract is preserved (asserted in
  * VectorExprSpec).
  */
case class CosineMilliExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_milli needs two array<float> inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cosine_milli"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    math.floor(dot * 1000.0 / (math.sqrt(na) * math.sqrt(nb))).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $x.getFloat($i);
          double $yi = (double) $y.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = (long) Math.floor($dot * 1000.0 / (Math.sqrt($na) * Math.sqrt($nb)));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineMilliExpr =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string mod 2^31-1, char at a time —
  * `acc = (acc * 31 + codepoint) mod p` — as a codegen'd Catalyst
  * expression (SURVEY.md §4.2 #3's middle rung, same justification as
  * [[CosineMilliExpr]]: this hash sits on the split/shard/sample hot
  * paths of t04/t06/t08/t11/t17, where the pure-builtin
  * `transform(split(s, ""), ascii) |> aggregate` formulation runs as
  * interpreted higher-order lambdas OUTSIDE whole-stage codegen and
  * allocates a per-row codes array).
  *
  * Exact-equivalence contract: iterates Unicode CODE POINTS (what
  * `split(s, "")` + `ascii` see for all BMP and supplementary text, and
  * what the DuckDB oracles' `substring(s, i, 1)` / `ascii` loop
  * computes), accumulating in non-negative longs, so results are
  * bit-identical to [[TextFns.polyHashInterpreted]] and to the oracle SQL
  * (asserted in VectorExprSpec).
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash needs a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val js = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val js = ctx.freshName("js")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
        java.lang.String $js = $s.toString();
        long $acc = 0L;
        int $i = 0;
        while ($i < $js.length()) {
          int $cp = $js.codePointAt($i);
          $acc = ($acc * 31L + $cp) % 2147483647L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Content-defined chunk boundaries (t34): the 1-indexed positions i in
  * [8, n-1] where the base-31 polynomial hash (mod 2147483647) of the
  * trailing 8 code points is 0 mod 64. Bit-identical to the declarative
  * `filter(sequence(...), i -> aggregate(...))` formulation (and to the
  * DuckDB oracle's list_filter/list_reduce) — but Catalyst higher-order
  * functions interpret their lambda per element, which made the HOF form
  * t34's whole cost (measured 12.7 s at sf0.1); this native expression is
  * one tight JVM loop per document inside whole-stage codegen.
  *
  * The window hash is recomputed per position (8 multiplies) rather than
  * rolled incrementally: same O(8n) arithmetic the declarative form
  * specifies, so equality with the oracle is by construction, and 8 ops
  * per char is memory-bound anyway.
  */
case class CdcBoundariesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries needs a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CdcBoundariesExpr.boundaries(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val out = ctx.freshName("out")
      s"""
        int[] $out = graft.functions.CdcBoundariesExpr.boundaries($s.toString());
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundariesExpr =
    copy(child = newChild)
}

object CdcBoundariesExpr {
  /** Shared by eval and codegen: one pass over the code points. */
  def boundaries(s: String): Array[Int] = {
    // code-point positions, matching SQL substring/ascii character semantics
    val cps = s.codePoints().toArray
    val n = cps.length
    val buf = new java.util.ArrayList[Integer]()
    var i = 8 // 1-indexed window end
    while (i <= n - 1) {
      var acc = 0L
      var j = i - 8
      while (j < i) { acc = (acc * 31 + cps(j)) % 2147483647L; j += 1 }
      if (acc % 64 == 0) buf.add(i)
      i += 1
    }
    val out = new Array[Int](buf.size())
    var k = 0
    while (k < out.length) { out(k) = buf.get(k); k += 1 }
    out
  }
}

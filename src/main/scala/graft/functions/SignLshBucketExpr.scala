package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-LSH bucket id — one bit per hyperplane, bit i = sign(v·pᵢ) — as a
  * codegen'd expression over an `array<float>` embedding. The builtin
  * formulation ([[VectorFns.signLshBucket]]) expands to nPlanes interpreted
  * `zip_with`/`aggregate` passes per row, each allocating an intermediate
  * array — measured two orders of magnitude slower per row than a fused
  * loop (see the DedupQueries kernel-vs-expression note). Here all planes
  * evaluate in one generated loop nest with the plane matrix attached as a
  * codegen reference object, so corpus-wide bucket assignment (s02's scan
  * stage) stays inside whole-stage codegen.
  *
  * Bit-equality contract: dot products accumulate sequentially over
  * dimension index in double precision, exactly like the interpreted form
  * and the DuckDB literal-plane oracles (asserted in VectorExprSpec).
  */
case class SignLshBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63, s"1..63 planes, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket needs an array<float> input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toFloatArray()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var acc = 0.0
      var d = 0
      val n = math.min(v.length, pl.length)
      while (d < n) { acc += v(d).toDouble * pl(d); d += 1 }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val v = ctx.freshName("v")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      s"""
        float[] $v = $arr.toFloatArray();
        long $bucket = 0L;
        for (int $p = 0; $p < $planesRef.length; $p++) {
          double[] $pl = $planesRef[$p];
          double $acc = 0.0;
          int $n = java.lang.Math.min($v.length, $pl.length);
          for (int $d = 0; $d < $n; $d++) {
            $acc += (double) $v[$d] * $pl[$d];
          }
          if ($acc >= 0) $bucket |= (1L << $p);
        }
        ${ev.value} = $bucket;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucketExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Positional n-token shingle keys as 64-bit hashes, computed straight from
  * per-token FNV-1a hashes with a polynomial window combine — no shingle
  * STRING is ever materialized. The string formulation (concat 8 tokens ->
  * ~70-byte string -> xxhash64) allocates O(tokens x n) bytes per document
  * before hashing them away; at corpus scale that allocation IS the cost of
  * the shingle pass. Here each token is hashed once (O(chars)) and each
  * window is an n-term polynomial in longs (O(tokens x n) multiplies, zero
  * allocation), fused into whole-stage codegen.
  *
  * Semantics contract (what t07/t14/t20 need): output(i) is a key whose
  * EQUALITY coincides with equality of the token window starting at i —
  * docs shorter than n tokens yield exactly one partial-window key, like
  * the string kernel's single partial shingle. The key value itself is
  * never exposed (join/group key only), so oracles that join on raw shingle
  * strings still hash-match; the collision budget (~pairs^2 / 2^64) is the
  * same class as the xxhash64-of-string form it replaces.
  */
case class ShingleHashesExpr(child: Expression, n: Int = 8)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs an array<string> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      var h = 0xcbf29ce484222325L
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).toString
        var j = 0
        while (j < t.length) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
      }
      th(i) = h
      i += 1
    }
    val m = math.max(len - (n - 1), 1)
    val out = new Array[Long](m)
    var w = 0
    while (w < m) {
      var acc = 0x9E3779B97F4A7C15L
      var k = 0
      val end = math.min(n, len - w)
      while (k < end) { acc = acc * 0x100000001b3L + th(w + k); k += 1 }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val th = ctx.freshName("th")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val end = ctx.freshName("end")
      s"""
        int $len = $arr.numElements();
        long[] $th = new long[$len];
        for (int $i = 0; $i < $len; $i++) {
          long $h = 0xcbf29ce484222325L;
          if (!$arr.isNullAt($i)) {
            java.lang.String $t = $arr.getUTF8String($i).toString();
            for (int $j = 0; $j < $t.length(); $j++) {
              $h ^= $t.charAt($j);
              $h *= 0x100000001b3L;
            }
          }
          $th[$i] = $h;
        }
        int $m = java.lang.Math.max($len - ${n - 1}, 1);
        long[] $out = new long[$m];
        for (int $w = 0; $w < $m; $w++) {
          long $acc = 0x9E3779B97F4A7C15L;
          int $end = java.lang.Math.min($n, $len - $w);
          for (int $k = 0; $k < $end; $k++) {
            $acc = $acc * 0x100000001b3L + $th[$w + $k];
          }
          $out[$w] = $acc;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

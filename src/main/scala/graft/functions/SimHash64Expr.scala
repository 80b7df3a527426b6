package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash signature of a token array — per-token FNV-1a, per-bit
  * majority vote — as a codegen'd Catalyst expression (SURVEY.md §4.2 #3's
  * middle rung, the same ladder step as [[PolyHashExpr]] and
  * [[CosineMilliExpr]]): d04's signature construction previously ran as a
  * typed `Dataset.map`, i.e. full row ser/deser outside whole-stage codegen
  * on a whole-corpus scan. As an expression the tokenize -> hash -> vote
  * loop fuses into the scan stage.
  *
  * Exact-equivalence contract: FNV-1a over UTF-16 code UNITS
  * (`h ^= charAt(i); h *= 0x100000001b3`), votes over all 64 bits, bit b
  * set iff its vote is strictly positive — bit-identical to the JVM kernel
  * it replaces (asserted in VectorExprSpec on random corpora) and to the
  * DuckDB HUGEINT oracle, which models the same char loop (the fixtures'
  * text is BMP-only, where UTF-16 units = code points).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs an array<string> input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).toString
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < t.length) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
        int[] $votes = new int[64];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if (!$arr.isNullAt($i)) {
            java.lang.String $t = $arr.getUTF8String($i).toString();
            long $h = 0xcbf29ce484222325L;
            for (int $j = 0; $j < $t.length(); $j++) {
              $h ^= $t.charAt($j);
              $h *= 0x100000001b3L;
            }
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) != 0L) $votes[$b]++; else $votes[$b]--;
            }
          }
        }
        long $sig = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) $sig |= (1L << $b);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

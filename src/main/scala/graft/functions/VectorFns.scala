package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType(FloatType)` embedding columns —
  * native `zip_with`/`aggregate` expressions, no per-row UDFs (SURVEY.md
  * §2.2 LLM ops). Accumulation is sequential left-to-right in double
  * precision, which is bit-identical to DuckDB's list_dot_product — that is
  * what makes cosine results hash-matchable cross-engine.
  */
object VectorFns {

  /** Sequential double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in exact integer-milli form (floor(1000 * cos)) for
    * cross-engine hash stability. Backed by the codegen'd fused
    * [[CosineMilliExpr]] (one loop instead of three interpreted
    * higher-order passes — bit-identical by construction; see its
    * scaladoc). [[cosineMilliInterpreted]] keeps the pure-builtin form as
    * the equivalence oracle.
    *
    * Example (run verbatim by DocExamplesSpec):
    * {{{
    * val df = Seq((Array(1f, 0f), Array(1f, 0f)), (Array(1f, 0f), Array(0f, 1f)))
    *   .toDF("a", "b")
    * df.select(VectorFns.cosineMilli($"a", $"b")).as[Long].collect().toSeq == Seq(1000L, 0L)
    * }}}
    */
  def cosineMilli(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CosineMilliExpr(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** The original zip_with/aggregate formulation — used to prove the custom
    * expression bit-equal (VectorExprSpec). */
  def cosineMilliInterpreted(a: Column, b: Column): Column =
    floor(dot(a, b) * lit(1000.0) / (norm2(a) * norm2(b))).cast("long")

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Deterministic pseudo-random hyperplanes for sign-LSH, generated with a
    * fixed-seed LCG at plan-construction time (driver side, tiny). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      // top 53 bits -> (-1, 1)
      (s >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    Array.fill(nPlanes, dim)(next())
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of v·h), backed by
    * the codegen'd [[SignLshBucketExpr]] — all planes in one fused loop on
    * the scan stage. [[signLshBucketInterpreted]] keeps the pure-builtin
    * formulation as the bit-equality reference (VectorExprSpec). */
  def signLshBucket(v: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SignLshBucketExpr(org.apache.spark.sql.graft.Bridge.expression(v), planes))

  /** The original per-plane zip_with/aggregate formulation — nPlanes
    * interpreted passes per row; reference semantics only. */
  def signLshBucketInterpreted(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      when(dot(v, pl) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}

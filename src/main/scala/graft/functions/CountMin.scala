package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable count-min sketch (Cormode–Muthukrishnan '05) over Long keys —
  * a typed [[Aggregator]], so Spark builds per-partition sketches map-side
  * and the merge tree sums them cell-wise: O(Depth x Width) state per task,
  * raw keys never shuffle. Complements [[MisraGries]]: MG answers "which
  * keys are heavy", CMS answers "how often is THIS key" for any key, and —
  * the capability q71 exercises — the row-wise sketch inner product
  * estimates a JOIN SIZE without running the join (the planner's
  * cardinality question at 100 TB, answered from two O(1 KB) summaries).
  *
  * Deterministic guarantees (hold under ANY partitioning / merge order —
  * every cell is an exact sum of its keys' counts):
  *   - estimate(x)    >= exact(x)          (never underestimates)
  *   - innerProduct   >= exact join size   (same argument, row-wise)
  * The overestimate is collision mass; the classic probabilistic bound is
  * eps = e/Width per unit L1 mass with failure probability e^-Depth.
  * Hashes are fixed-seed pairwise-independent affine maps mod a prime, so
  * results are reproducible across runs and engines.
  *
  * Example (run verbatim by DocExamplesSpec):
  * {{{
  * val sk = spark.createDataset(Seq(1L, 1L, 1L, 2L))
  *   .select(new CountMin().toColumn).head()
  * CountMin.estimate(sk, 1L) >= 3L && CountMin.estimate(sk, 2L) >= 1L
  * }}}
  */
final class CountMin extends Aggregator[Long, Array[Long], Array[Long]] {
  import CountMin._

  def zero: Array[Long] = new Array[Long](Depth * Width)

  def reduce(b: Array[Long], a: Long): Array[Long] = {
    var i = 0
    while (i < Depth) { b(i * Width + cell(i, a)) += 1L; i += 1 }
    b
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  val Depth = 4
  val Width = 256
  private val P = 2147483647L // 2^31 - 1

  /** Fixed-seed affine hash params (same LCG discipline as the minhash
    * family): a nonzero and < 2^20 so a*h never overflows a Long. */
  private val (hashA, hashB): (Array[Long], Array[Long]) = {
    var s = 7L
    def next(bound: Long): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % bound + bound) % bound
    }
    (Array.fill(Depth)(next(1L << 20) + 1), Array.fill(Depth)(next(P)))
  }

  private def cell(row: Int, key: Long): Int = {
    val h = ((key % P) + P) % P
    (((h * hashA(row) + hashB(row)) % P) % Width).toInt
  }

  /** Point-frequency estimate: min over rows of the key's cell. */
  def estimate(sk: Array[Long], key: Long): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val v = sk(i * Width + cell(i, key))
      if (v < m) m = v
      i += 1
    }
    m
  }

  /** Equi-join-size estimate of the two sketched multisets: min over rows
    * of the row-wise inner product. Never below the exact join size. */
  def innerProduct(a: Array[Long], b: Array[Long]): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < Depth) {
      var s = 0L
      var j = 0
      while (j < Width) { s += a(i * Width + j) * b(i * Width + j); j += 1 }
      if (s < m) m = s
      i += 1
    }
    m
  }
}

package graft

import graft.operators.EventQueries
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (q48's core): semantic checks on hand-built graphs
  * where the stationary distribution is known, plus the mass invariants the
  * integer scheme guarantees.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val e = edges.toDF("src", "dst", "w")
    val n = nodes.toDF("k")
    EventQueries.pageRank(n, e, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star graph: the hub cycle out-ranks the quiet spokes, which tie") {
    // a, b, c each link only to hub; hub links back to a single spoke.
    // hub <-> a is 2-periodic, so compare the cycle against the quiet
    // spokes (period-robust) rather than hub vs a at a fixed iteration.
    val r = ranks(Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (0L, 1L, 1L)), Seq(0L, 1L, 2L, 3L))
    assert(r(0L) > r(2L) && r(1L) > r(2L))
    assert(r(2L) === r(3L)) // same in-link structure => identical rank
    assert(r(2L) === 150000L) // no in-links => exactly the teleport term
  }

  test("symmetric cycle: every node converges to the same rank") {
    val cyc = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 0L, 1L))
    val r = ranks(cyc, Seq(0L, 1L, 2L, 3L))
    assert(r.values.toSet.size === 1)
    // closed cycle conserves mass up to truncation: near the 1e6 start
    assert(r(0L) > 990000L && r(0L) <= 1000000L)
  }

  test("mass bounds: teleport floor holds, total never exceeds the start mass") {
    val e = Seq((0L, 1L, 3L), (1L, 2L, 1L), (2L, 0L, 2L), (3L, 0L, 1L))
    val r = ranks(e, Seq(0L, 1L, 2L, 3L, 4L)) // node 4 is isolated
    assert(r.values.forall(_ >= 150000L)) // teleport term is a hard floor
    assert(r.values.sum <= 5000000L) // truncating division only loses mass
    assert(r(4L) === 150000L) // isolated node keeps exactly the teleport term
  }

  test("edge weights matter: the heavier-weighted target ranks higher") {
    // src splits 9:1 between two targets with otherwise identical structure
    val r = ranks(Seq((0L, 1L, 9L), (0L, 2L, 1L)), Seq(0L, 1L, 2L))
    assert(r(1L) > r(2L))
  }

  test("q48 on the fixture: one rank per page, deterministic across runs") {
    val q = SparkEntry.queries("q48_pagerank_authority")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.nonEmpty && a.map(_.getLong(0)).distinct.length === a.length)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // ranks differentiate: a real transition graph is not rank-uniform
    assert(a.map(_.getLong(1)).distinct.length > 1)
  }

  test("triangleCounts on a known graph: shared-edge triangles + triangle-free tail") {
    // 1-2-3 and 2-3-4 are triangles sharing edge (2,3); (4,5) closes nothing
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = EventQueries.triangleCounts(edges).orderBy($"node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 3L, 2L),
      (4L, 3L, 1L), (5L, 1L, 0L)))
  }

  test("triangleCounts on a hub star: orientation keeps the celebrity cheap") {
    // 1 hub + 40 leaves + ONE leaf-leaf edge: exactly one triangle. The
    // degree orientation points every leaf at the hub, so the hub has no
    // out-wedges — the shape that makes skewed graphs tractable at scale.
    val star = (2L to 41L).map(l => (1L, l))
    val edges = (star :+ (2L, 3L)).map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("u", "v")
    val got = EventQueries.triangleCounts(edges)
    assert(got.agg(sum($"n_tri")).head.getLong(0) === 3L) // one triangle x 3 roles
    assert(got.filter($"node".isin(1L, 2L, 3L) && $"n_tri" === 1L).count() === 3L)
    assert(got.filter($"n_tri" === 0L).count() === 38L)
  }

  test("bfsLevels: path + unreachable component, cycle, and direction respected") {
    def nodes(ks: Long*) = ks.toDF("k")
    def edges(es: (Long, Long)*) = es.toDF("src", "dst")
    val got = EventQueries.bfsLevels(
      nodes(1L, 2L, 3L, 4L, 5L, 6L), edges((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)), 1L)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, -1L), (6L, -1L)))
    val cyc = EventQueries.bfsLevels(
      nodes(1L, 2L, 3L), edges((1L, 2L), (2L, 3L), (3L, 1L)), 1L)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(cyc === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    // edges are DIRECTED: 2 -> 1 gives source 1 no way out
    val dir = EventQueries.bfsLevels(nodes(1L, 2L), edges((2L, 1L)), 1L)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(dir === Seq((1L, 0L), (2L, -1L)))
    // absent source: everything unreachable
    val none = EventQueries.bfsLevels(nodes(1L, 2L), edges((1L, 2L)), 9L)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(none === Seq((1L, -1L), (2L, -1L)))
  }

  test("q54 triangle totals are divisible by three roles and nodes cover the graph") {
    val rows = SparkEntry.queries("q54_triangle_counts")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum % 3 === 0)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }
}

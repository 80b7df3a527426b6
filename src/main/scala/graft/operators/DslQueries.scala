package graft.operators

import graft.{QueryDef, Tables}
import graft.dsl.{Compiler, Keyed, SP}
import org.apache.spark.sql.functions._

/** REF-layer queries: rspl DSL terms compiled to Spark plans and checked
  * against DuckDB oracles (SURVEY.md §2.1 R4-R9). Each query exercises one
  * compilation path of [[graft.dsl.Compiler]]:
  *   r01 expression pipeline, r02 alternate->parity routing, r03 generators,
  *   r04 data-dependent bind, r05 stateful Get/Put FSM, r06 typed fusion.
  */
object DslQueries {

  /** lineitem row as a typed element for the lambda paths. */
  final case class Li(l_orderkey: Long, l_linenumber: Int, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double)

  val all: Seq[QueryDef] = Seq(

    // ----- R4/R5/R6: map∘filter pipeline via the expression path ------------
    QueryDef(
      "r01_dsl_expr_pipeline",
      (s, d) => {
        import s.implicits._
        val sp = SP.compose(
          SP.filterExpr[org.apache.spark.sql.Row](
            r => r.getAs[Double]("l_quantity") >= 30.0,
            v => v.getField("l_quantity") >= 30.0),
          SP.mapExpr[org.apache.spark.sql.Row, org.apache.spark.sql.Row](
            identity,
            v => struct(
              v.getField("l_orderkey").as("l_orderkey"),
              v.getField("l_linenumber").as("l_linenumber"),
              floor(v.getField("l_extendedprice") * (lit(1) - v.getField("l_discount")) * 100)
                .cast("long").as("revenue_c"))))
        val df = Tables.lineitem(s, d)
          .select(struct($"l_orderkey", $"l_linenumber", $"l_quantity",
            $"l_extendedprice", $"l_discount").as("value"))
        Compiler.compileExpr(sp, df, "value")
          .getOrElse(sys.error("expression pipeline expected"))
          .select($"value.*")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_c
        FROM lineitem
        WHERE l_quantity >= 30.0
        ORDER BY l_orderkey, l_linenumber""")),

    // ----- R7: alternate(map, map) -> row_number parity routing -------------
    QueryDef(
      "r02_dsl_alternate",
      (s, d) => {
        import s.implicits._
        val sp = SP.alternate(
          SP.mapExpr[Double, Double](_ * 2.0, v => v * 2.0),
          SP.mapExpr[Double, Double](_ / 2.0, v => v / 2.0))
        val df = Tables.events(s, d).select($"user_id", $"event_id", $"value".as("value"))
        Compiler.compileAlternateExpr(sp, df, "value", "user_id", "event_id")
          .getOrElse(sys.error("alternate(map,map) expected"))
          .select($"user_id", $"event_id", floor($"value" * 100).cast("long").as("out_c"))
          .orderBy($"event_id")
      },
      oracle = Some("""
        SELECT user_id, event_id,
               CAST(floor(CASE WHEN rn % 2 = 1 THEN value * 2.0 ELSE value / 2.0 END * 100) AS BIGINT) AS out_c
        FROM (SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
              FROM events)
        ORDER BY event_id""")),

    // ----- R8: demand-driven generators (reference tests/demands.rs) --------
    QueryDef(
      "r03_dsl_generate_numerics",
      (s, d) => {
        import s.implicits._
        // babylonian sqrt(2): reference demands.rs:16-18
        val babylon = Compiler.generateN[Double, Double](
          s, x => (x, (x + 2.0 / x) / 2.0), 1.0, 11)
          .map { case (i, x) => ("babylon2", i, math.floor(x * 1e9).toLong) }
        // BBP pi: demands.rs:21-33 (16^k tracked multiplicatively — exact)
        val bbp = Compiler.generateN[Double, (Double, Long, Double)](
          s, { case (sum, k, p16) =>
            val term = (1.0 / p16) *
              (4.0 / (8 * k + 1).toDouble - 2.0 / (8 * k + 4).toDouble -
                1.0 / (8 * k + 5).toDouble - 1.0 / (8 * k + 6).toDouble)
            (sum, (sum + term, k + 1, p16 * 16.0))
          }, (0.0, 0L, 1.0), 6)
          .map { case (i, x) => ("bbp_pi", i, math.floor(x * 1e9).toLong) }
        // Euler e: demands.rs:36-42
        val euler = Compiler.generateN[Double, (Double, Long, Long)](
          s, { case (sum, k, kfac) =>
            (sum, (sum + 1.0 / kfac.toDouble, k + 1, kfac * (k + 1)))
          }, (1.0, 1L, 1L), 11)
          .map { case (i, x) => ("euler_e", i, math.floor(x * 1e9).toLong) }
        babylon.union(bbp).union(euler)
          .toDF("series", "step", "value_nano")
          .orderBy($"series", $"step")
      },
      oracle = Some("""
        WITH RECURSIVE
        babylon(step, x) AS (
          SELECT CAST(0 AS BIGINT), CAST(1.0 AS DOUBLE)
          UNION ALL
          SELECT step + 1, (x + 2.0 / x) / 2.0 FROM babylon WHERE step < 10),
        bbp(step, s, k, p16) AS (
          SELECT CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT), CAST(1.0 AS DOUBLE)
          UNION ALL
          SELECT step + 1,
                 s + (1.0 / p16) * (4.0 / (8*k + 1) - 2.0 / (8*k + 4) - 1.0 / (8*k + 5) - 1.0 / (8*k + 6)),
                 k + 1, p16 * 16.0
          FROM bbp WHERE step < 5),
        euler(step, s, k, kfac) AS (
          SELECT CAST(0 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT), CAST(1 AS BIGINT)
          UNION ALL
          SELECT step + 1, s + 1.0 / kfac, k + 1, kfac * (k + 1)
          FROM euler WHERE step < 10)
        SELECT series, step, value_nano FROM (
          SELECT 'babylon2' AS series, step, CAST(floor(x * 1e9) AS BIGINT) AS value_nano FROM babylon
          UNION ALL
          SELECT 'bbp_pi', step, CAST(floor(s * 1e9) AS BIGINT) FROM bbp
          UNION ALL
          SELECT 'euler_e', step, CAST(floor(s * 1e9) AS BIGINT) FROM euler)
        ORDER BY series, step""")),

    // ----- R9: bind — first output chooses the downstream plan --------------
    QueryDef(
      "r04_dsl_bind",
      (s, d) => {
        import s.implicits._
        val sp = SP.compose(
          SP.filterExpr[String](_ != "P", v => v =!= "P"),
          SP.mapExpr[String, String](identity, identity))
        val df = Tables.orders(s, d)
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus".as("value"))
        Compiler.bindDF(sp, df, "value", "o_orderkey") { first =>
          val mult = if (first == "F") 2.0 else 3.0
          rest => rest.select($"o_orderkey",
            floor($"o_totalprice" * mult * 100).cast("long").as("out_c"))
        }.orderBy($"o_orderkey")
      },
      oracle = Some("""
        WITH first_np AS (
          SELECT o_orderkey AS fk, o_orderstatus AS fs
          FROM orders WHERE o_orderstatus != 'P'
          ORDER BY o_orderkey LIMIT 1)
        SELECT o_orderkey,
               CAST(floor(o_totalprice * (CASE WHEN (SELECT fs FROM first_np) = 'F'
                 THEN 2.0 ELSE 3.0 END) * 100) AS BIGINT) AS out_c
        FROM orders
        WHERE o_orderkey > (SELECT fk FROM first_np)
        ORDER BY o_orderkey""")),

    // ----- R1/R2/P1: stateful Get/Put FSM per key (batch form) --------------
    QueryDef(
      "r05_dsl_fsm_stateful",
      (s, d) => {
        import s.implicits._
        // toggle on signup; while toggled, purchases emit (event_id, cents)
        def machine(active: Boolean): SP[(String, Double, Long), (Long, Long)] =
          SP.fsm(active) { (st, e: (String, Double, Long)) =>
            e match {
              case ("signup", _, _) => (!st, Nil)
              case ("purchase", v, id) if st => (st, Seq((id, math.floor(v * 100).toLong)))
              case _ => (st, Nil)
            }
          }
        val ds = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type", $"value")
          .as[(Long, Long, String, Double)]
          .map { case (u, id, t, v) => Keyed(u, id, (t, v, id)) }
        Compiler.compile(machine(false))(ds)
          .select($"key".as("user_id"), $"value._1".as("event_id"), $"value._2".as("value_c"))
          .orderBy($"user_id", $"event_id")
      },
      oracle = Some("""
        SELECT user_id, event_id,
               CAST(floor(value * 100) AS BIGINT) AS value_c
        FROM (
          SELECT user_id, event_id, event_type, value,
                 sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_signups
          FROM events)
        WHERE event_type = 'purchase' AND n_signups % 2 = 1
        ORDER BY user_id, event_id""")),

    // ----- R4/R6 typed path: lambda fusion, no shuffle ----------------------
    QueryDef(
      "r06_dsl_typed_fusion",
      (s, d) => {
        import s.implicits._
        val sp = SP.compose(
          SP.filter[Li](_.l_quantity >= 49.0),
          SP.map[Li, (Long, Int, Long)](li => (li.l_orderkey, li.l_linenumber,
            math.floor(li.l_extendedprice * (1 - li.l_discount) * 100).toLong)))
        val ds = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount")
          .as[Li]
          .map(li => Keyed(li.l_orderkey, li.l_linenumber.toLong, li))
        Compiler.compile(sp)(ds)
          .select($"value._1".as("l_orderkey"), $"value._2".as("l_linenumber"),
            $"value._3".as("revenue_c"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_c
        FROM lineitem
        WHERE l_quantity >= 49.0
        ORDER BY l_orderkey, l_linenumber""")))
}

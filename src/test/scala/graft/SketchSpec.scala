package graft

import org.apache.spark.sql.functions._

/** q24's sketches have no cross-engine oracle (HLL++ and the
  * approx-percentile digest are Spark-internal algorithms), so bound them
  * against the exact answers instead: the sketch estimates must sit
  * within their published error envelopes. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("approx_count_distinct is within HLL++ tolerance of exact") {
    val joined = SparkEntry.queries("q24_approx_sketches")(spark, sf)
      .join(
        Tables.lineitem(spark, sf).groupBy($"l_returnflag")
          .agg(countDistinct($"l_partkey").as("exact_parts")),
        "l_returnflag")
      .select($"l_returnflag", $"approx_parts", $"exact_parts")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      // default rsd 0.05; allow 4 sigma
      assert(math.abs(approx - exact) / exact <= 0.20,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx(0.5) lands between the exact 40th and 60th percentiles") {
    val exact = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.4, 0.6))").as("bounds"))
    val joined = SparkEntry.queries("q24_approx_sketches")(spark, sf)
      .join(exact, "l_returnflag")
      .select($"l_returnflag", $"approx_median_price", $"bounds")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val m = r.getDouble(1)
      val bounds = r.getSeq[Double](2)
      assert(m >= bounds(0) && m <= bounds(1),
        s"${r.getString(0)}: approx median $m outside [${bounds(0)}, ${bounds(1)}]")
    }
  }
}

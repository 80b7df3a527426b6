package graft

import org.apache.spark.sql.functions._

/** q24's sketches have no cross-engine oracle for their RAW estimates
  * (HLL++ and the approx-percentile digest are Spark-internal algorithms),
  * so q24 itself now emits exact values plus within-tolerance booleans the
  * DuckDB oracle can match. This spec additionally bounds the raw
  * estimates against exact answers — the direct check the driver gate
  * can't express. */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("q24's within-tolerance flags are all true (oracle-checkable form)") {
    val rows = SparkEntry.queries("q24_approx_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: approx_parts outside 5%")
      assert(r.getBoolean(3), s"${r.getString(0)}: approx median outside 5%")
    }
  }

  test("approx_count_distinct is within HLL++ tolerance of exact") {
    val rows = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey").as("approx_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // default rsd 0.05; allow 4 sigma
      assert(math.abs(approx - exact) / exact <= 0.20,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx(0.5) lands between the exact 40th and 60th percentiles") {
    val rows = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.4, 0.6))").as("bounds"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx_median_price"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bounds = r.getSeq[Double](1)
      val m = r.getDouble(2)
      assert(m >= bounds(0) && m <= bounds(1),
        s"${r.getString(0)}: approx median $m outside [${bounds(0)}, ${bounds(1)}]")
    }
  }

  test("Misra–Gries: exact when distinct keys fit the summary") {
    val mg = new graft.functions.MisraGries(8)
    val data = (0L until 1000L).map(_ % 5) // 5 distinct <= k=8: never evicts
    val got = spark.createDataset(data).repartition(7).select(mg.toColumn).head()
    assert(got === data.groupBy(identity).map { case (k, v) => k -> v.size.toLong })
  }

  test("Misra–Gries guarantees hold under multi-partition merge on skewed keys") {
    val k = 3
    val mg = new graft.functions.MisraGries(k)
    // zipf-ish: key K appears 2^K times, K = 0..11 (4095 rows, heavy tail)
    val data = for (key <- 0 until 12; _ <- 0 until (1 << key)) yield key.toLong
    val exact = data.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    val n = data.size.toLong
    val bound = graft.functions.MisraGries.bound(n, k)
    // adversarial placement: run the same summary over several partitionings
    for (parts <- Seq(1, 4, 13)) {
      val got = spark.createDataset(data.toSeq).repartition(parts)
        .select(mg.toColumn).head()
      assert(got.size <= k, s"summary overflow at parts=$parts: $got")
      got.foreach { case (key, est) =>
        assert(est <= exact(key), s"overestimate of $key at parts=$parts")
        assert(est >= exact(key) - bound,
          s"$key underestimated past the bound at parts=$parts: $est vs ${exact(key)}")
      }
      exact.foreach { case (key, c) =>
        if (c > bound)
          assert(got.contains(key), s"guaranteed survivor $key lost at parts=$parts")
      }
    }
  }

  test("count-min: never underestimates, exact sketch under any partitioning") {
    import graft.functions.CountMin
    val cm = new CountMin()
    // zipf-ish multiset over a domain far wider than Width: collisions real
    val data = for (key <- 0 until 600; _ <- 0 until (key % 7 + 1)) yield key.toLong * 31
    val exact = data.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    val base = spark.createDataset(data.toSeq).select(cm.toColumn).head()
    // cells are exact sums => the whole sketch is partitioning-invariant
    for (parts <- Seq(4, 13)) {
      val got = spark.createDataset(data.toSeq).repartition(parts)
        .select(cm.toColumn).head()
      assert(got.toSeq === base.toSeq, s"sketch varies with partitioning at $parts")
    }
    exact.foreach { case (key, c) =>
      assert(CountMin.estimate(base, key) >= c, s"underestimate of $key")
    }
    // small distinct domain: no collisions possible across all rows => exact
    val small = (0L until 40L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
    val sk = spark.createDataset(small).select(cm.toColumn).head()
    small.groupBy(identity).foreach { case (k, v) =>
      assert(CountMin.estimate(sk, k) === v.size.toLong)
    }
  }

  test("count-min inner product upper-bounds the exact equi-join size") {
    import graft.functions.CountMin
    val cm = new CountMin()
    val a = (0L until 300L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val b = (150L until 450L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
    val ska = spark.createDataset(a).select(cm.toColumn).head()
    val skb = spark.createDataset(b).select(cm.toColumn).head()
    val ca = a.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cb = b.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val exactJoin = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    val est = CountMin.innerProduct(ska, skb)
    assert(est >= exactJoin, "inner product must never undercount the join")
    val bound = exactJoin + 4L * a.size * b.size / CountMin.Width
    assert(est <= bound, s"estimate $est beyond the collision bound $bound (exact $exactJoin)")
  }

  test("q71: the probabilistic eps-bound holds on the fixture (kept out of the oracle)") {
    // q71's oracled columns are all deterministic; the Markov-type
    // est <= exact + 4*nE*nO/Width claim (failure class ~(1/4)^Depth with
    // the fixed seeds) is pinned HERE, where a seed/fixture change fails a
    // test instead of silently invalidating a hardcoded oracle TRUE.
    import graft.functions.CountMin
    val cms = new CountMin().toColumn
    import spark.implicits._
    val skE = Tables.events(spark, sf).select($"user_id").as[Long].select(cms).head()
    val skO = Tables.orders(spark, sf).select($"o_custkey").as[Long].select(cms).head()
    val est = CountMin.innerProduct(skE, skO)
    val exact = Tables.events(spark, sf)
      .join(Tables.orders(spark, sf), $"user_id" === $"o_custkey").count()
    val bound = exact +
      4L * skE.take(CountMin.Width).sum * skO.take(CountMin.Width).sum / CountMin.Width
    assert(est >= exact, s"CMS inner product $est undercounts exact $exact")
    assert(est <= bound, s"CMS estimate $est beyond the eps bound $bound (exact $exact)")
  }

  test("olsFit recovers a planted line exactly and bounds R² on noise") {
    import graft.operators.ExtraRelationalQueries.olsFit
    // y = 3x + 7 exactly: slope/intercept/R² all land on exact values
    val line = (0L until 50L).map(x => ("a", x, 3 * x + 7)).toDF("seg", "x", "y")
    val r = olsFit(line).head()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((3000000L, 7000L, 1000L)))
    // deterministic "noise" (x % 5) keeps a strong but imperfect fit
    val noisy = (0L until 200L).map(x => ("b", x, 3 * x + 7 + (x % 5)))
      .toDF("seg", "x", "y")
    val rn = olsFit(noisy).head()
    assert(rn.getLong(4) < 1000L && rn.getLong(4) > 900L, s"R²=${rn.getLong(4)}")
    assert(math.abs(rn.getLong(2) - 3000000L) < 100000L, s"slope=${rn.getLong(2)}")
  }

  test("q75: chi-square cells conserve the corpus and the statistic is non-negative") {
    val rows = SparkEntry.queries("q75_chi_square")(spark, sf).collect()
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === n, "observed cells must conserve the corpus")
    assert(rows.map(_.getLong(5)).distinct.length === 1, "one total statistic")
    assert(rows.head.getLong(5) >= 0L)
    assert(rows.forall(_.getLong(4) >= 0L), "contributions are squares")
  }

  test("q77: rate + mix + interaction reconstruct the overall average change") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q77_mix_shift")(spark, sf).collect()
    val effects = rows.map(r => r.getLong(7) + r.getLong(8) + r.getLong(9)).sum / 1e6
    val o = Tables.orders(spark, sf)
      .filter(year($"o_orderdate").isin(1995, 1996))
      .select((year($"o_orderdate") === 1995).as("p1"),
        floor($"o_totalprice" * 100).cast("long").as("c"))
      .agg(sum(when($"p1", $"c")).as("s1"), sum(when($"p1", 1L)).as("n1"),
        sum(when(!$"p1", $"c")).as("s2"), sum(when(!$"p1", 1L)).as("n2"))
      .head()
    val delta = (o.getLong(2).toDouble / o.getLong(3) - o.getLong(0).toDouble / o.getLong(1)) / 100
    assert(math.abs(effects - delta) < 0.25,
      s"decomposition ${effects} should reconstruct the overall change $delta " +
        "within quantization slack")
  }

  test("q53's guarantee flags are all true (oracle-checkable form)") {
    val rows = SparkEntry.queries("q53_heavy_hitters_mg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"lvl ${r.getLong(0)}: estimate outside MG bound")
      assert(r.getBoolean(3), s"lvl ${r.getLong(0)}: guaranteed survivor missing")
    }
  }

  test("kmCurve: with no censoring KM equals the empirical survival fraction") {
    // 10 subjects, one churn event at each of t=1..10: S(t_i) = (10-i)/10,
    // and the integer recurrence telescopes exactly to 100*(10-i) millis.
    val lt = (1L to 10L).map(t => (t, true)).toDF("t", "churned")
    val rows = operators.ExtraRelationalQueries.kmCurve(lt).collect()
    assert(rows.length === 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i + 1L)
      assert(r.getLong(2) === 10L - i, "at-risk must shrink by one per event")
      assert(r.getLong(3) === 100L * (9 - i), s"S at t=${i + 1}")
    }
  }

  test("kmCurve: censored subjects leave the risk set without dropping the curve") {
    // churn at t=1 (3 at risk), censor at t=2, churn at t=3 (1 at risk):
    // steps only at event times; the censored subject never counts as death.
    val lt = Seq((1L, true), (2L, false), (3L, true)).toDF("t", "churned")
    val rows = operators.ExtraRelationalQueries.kmCurve(lt).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 3L), "steps only where d>0")
    assert(rows(0).getLong(2) === 3L && rows(0).getLong(3) === 666L)
    assert(rows(1).getLong(2) === 1L && rows(1).getLong(3) === 0L)
  }

  test("q85 on fixtures: survival is monotone nonincreasing within [0, 1000]") {
    val rows = SparkEntry.queries("q85_survival_km")(spark, sf).collect()
    assert(rows.nonEmpty)
    var prev = 1000L
    rows.foreach { r =>
      val s = r.getLong(3)
      assert(s >= 0L && s <= prev, s"S must fall from $prev, got $s at t=${r.getLong(0)}")
      assert(r.getLong(1) > 0L && r.getLong(2) >= r.getLong(1))
      prev = s
    }
  }

  test("seasonalBacktest: a perfectly periodic series backtests to zero MAE") {
    // 4 weeks of rev_c = 1000*(dow+1): every seasonal-naive forecast is
    // exact, dow means are the planted values, and the index is
    // 250*(dow+1) millis (overall mean 4000).
    val days = (0 until 28).map { i =>
      val day = java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i).atStartOfDay())  // 2024-01-01 is a Monday => dow=(i%7)
      (day, 1000L * (i % 7 + 1))
    }.toDF("day", "rev_c")
    val rows = operators.ExtraRelationalQueries.seasonalBacktest(days).collect()
    assert(rows.length === 7)
    rows.zipWithIndex.foreach { case (r, d) =>
      assert(r.getLong(0) === d.toLong)
      assert(r.getLong(1) === 4L)
      assert(r.getLong(2) === 1000L * (d + 1), "dow mean")
      assert(r.getLong(3) === 250L * (d + 1), "seasonality index")
      assert(r.getLong(4) === 0L, "seasonal-naive MAE must be zero")
    }
  }

  test("q87 skyline: kept points are non-dominated, dropped points are dominated") {
    val pts = Tables.lineitem(spark, sf).groupBy($"l_partkey")
      .agg(min(floor($"l_extendedprice" * 100 / $"l_quantity").cast("long")).as("unit_c"),
        sum($"l_quantity".cast("long")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = SparkEntry.queries("q87_skyline_pareto")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept.nonEmpty)
    def dominated(p: (Long, Long, Long)) = pts.exists(o => o._1 != p._1 &&
      o._2 <= p._2 && o._3 >= p._3 && (o._2 < p._2 || o._3 > p._3))
    kept.foreach(p => assert(!dominated(p), s"$p is on the frontier yet dominated"))
    // dropped points are dominated OR are coincident duplicates of a kept point
    pts.filterNot(kept).foreach { p =>
      assert(dominated(p) || kept.exists(k => k._2 == p._2 && k._3 == p._3),
        s"$p dropped but not dominated")
    }
  }

  test("q87 skyline merge law: per-partition frontiers merged and re-skylined equal the one-pass frontier") {
    // skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the claim that
    // makes the >1-task distributed recipe valid, executed: slice the
    // point set 4 ways, take each slice's local frontier, merge, re-run.
    import operators.ExtraRelationalQueries.skyline
    val pts = Tables.lineitem(spark, sf).groupBy($"l_partkey")
      .agg(min(floor($"l_extendedprice" * 100 / $"l_quantity").cast("long")).as("unit_c"),
        sum($"l_quantity".cast("long")).as("qty"))
      .cache()
    val onePass = skyline(pts).orderBy($"l_partkey").collect().toSeq
    val slices = (0 until 4).map(i => skyline(pts.filter(pmod($"l_partkey", lit(4)) === i)))
    val merged = skyline(slices.reduce(_ unionByName _))
      .orderBy($"l_partkey").collect().toSeq
    assert(merged === onePass)
    // the local pass must actually prune, or the law is vacuous here
    val localTotal = slices.map(_.count()).sum
    assert(localTotal < pts.count(), "local frontiers pruned nothing")
    assert(localTotal >= onePass.size.toLong)
    pts.unpersist()
  }

  test("ksReport: identical samples give D=0, disjoint supports give D=1000") {
    import operators.ExtraRelationalQueries.ksReport
    val same = Seq((1L, 5L, 5L), (2L, 3L, 3L), (9L, 2L, 2L)).toDF("v", "c1", "c2")
    val r0 = ksReport(same).head()
    assert(r0.getLong(2) === 0L, "identical distributions must have zero KS distance")
    // sample A entirely below sample B: at A's top value cdfA=1, cdfB=0
    val disjoint = Seq((1L, 4L, 0L), (2L, 6L, 0L), (10L, 0L, 5L)).toDF("v", "c1", "c2")
    val r1 = ksReport(disjoint).head()
    assert(r1.getLong(2) === 1000L && r1.getLong(3) === 2L,
      s"disjoint supports must reach D=1000 at A's last value, got $r1")
  }

  test("q89 sequencePatterns: planted histories match exactly the right patterns") {
    import operators.EventQueries.sequencePatterns
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // user 1: view->click->purchase; user 2: error,error; user 3: signup->view->purchase
    val ev = Seq(
      (1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "click"), (1L, ts(3), 12L, "purchase"),
      (2L, ts(1), 20L, "error"), (2L, ts(2), 21L, "error"),
      (3L, ts(1), 30L, "signup"), (3L, ts(2), 31L, "view"), (3L, ts(3), 32L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = sequencePatterns(ev, Seq(
      ("funnel_vcp", "v.*c.*p"), ("signup_purchase", "s.*p"),
      ("double_error", "ee"), ("starts_view", "^v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("double_error", 1L, 333L), ("funnel_vcp", 1L, 333L),
      ("signup_purchase", 1L, 333L), ("starts_view", 1L, 333L)))
  }

  test("q88 on fixtures: KS lies in [0,1000] and both snapshot counts are positive") {
    val r = SparkEntry.queries("q88_ks_drift")(spark, sf).head()
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L)
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000L)
  }

  test("q90: the EWMA recurrence and anomaly flags recompute exactly from the output") {
    val rows = SparkEntry.queries("q90_ewma_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    var e = -1L
    rows.foreach { r =>
      val (x, baseline, ewma) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (dev, anom) = (r.getLong(4), r.getBoolean(5))
      val prev = e
      assert(baseline === (if (prev < 0) x else prev), "baseline must be the prior ewma")
      e = if (prev < 0) x else (20 * x + 80 * prev) / 100
      assert(ewma === e, "integer EWMA recurrence must replay exactly")
      assert(dev === 1000L * math.abs(x - baseline) / math.max(baseline, 1L))
      assert(anom === (dev > 500L))
    }
  }

  test("q91 isotonicFit: equals brute-force minimax, is monotone, keeps monotone data") {
    import operators.ExtraRelationalQueries.isotonicFit
    val rnd = new scala.util.Random(23)
    val ser = (1L to 15L).map(f => (f, 1L + rnd.nextInt(5).toLong,
      (rnd.nextInt(10000) + 1).toLong))
    val got = isotonicFit(ser.toDF("f", "w", "sc")).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // monotone nondecreasing
    got.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a <= b); case _ => }
    // brute-force minimax: iso_i = max_{j<=i} min_{k>=i} mean(j..k)
    val n = ser.length
    def mean(j: Int, k: Int): Double = {
      val slice = ser.slice(j, k + 1)
      slice.map(_._3).sum.toDouble / slice.map(_._2).sum.toDouble
    }
    val minimax = (0 until n).map { i =>
      (0 to i).map(j => (i until n).map(k => mean(j, k)).min).max
    }
    got.zipWithIndex.foreach { case ((_, iso), i) =>
      assert(iso === math.floor(1000 * minimax(i)).toLong, s"at index $i")
    }
    // already-monotone data passes through untouched
    val mono = (1L to 8L).map(f => (f, 2L, 1000L * f * 2L))
    val flat = isotonicFit(mono.toDF("f", "w", "sc")).collect()
    flat.foreach(r => assert(r.getLong(3) === r.getLong(2),
      "monotone input must be its own isotonic fit"))
  }

  test("q92: median, MAD and outlier counts match a brute-force recomputation") {
    val rows = SparkEntry.queries("q92_mad_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf)
      .select($"l_returnflag", floor($"l_extendedprice" * 100).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    def disc(xs: Array[Long]): Long = {
      val s = xs.sorted
      s(math.ceil(s.length * 0.5).toInt - 1) // min value with cum/n >= 0.5
    }
    rows.foreach { r =>
      val vals = data(r.getString(0)).map(_._2)
      val med = disc(vals)
      val ads = vals.map(v => math.abs(v - med))
      val mad = disc(ads)
      val rzs = ads.map(ad => 1000L * ad / math.max(mad, 1L))
      assert(r.getLong(1) === vals.length.toLong)
      assert(r.getLong(2) === med, "median")
      assert(r.getLong(3) === mad, "MAD")
      assert(r.getLong(4) === rzs.count(_ > 3500L).toLong, "outliers")
      assert(r.getLong(5) === rzs.max, "max robust z")
    }
  }

  test("q93: cohort LTV matches a brute-force keyed KM recomputation") {
    val rows = SparkEntry.queries("q93_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    val per = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(min($"o_orderdate").as("f"), max($"o_orderdate").as("l"))
      .select(date_trunc("quarter", $"f").cast("string").as("cohort"),
        expr("CAST(datediff(l, f) div 7 AS BIGINT)").as("t"),
        expr("datediff(l, DATE '1970-01-01')").cast("long").as("lday"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val endDay = per.map(_._3).max
    val labeled = per.map { case (c, t, lday) => (c, t, endDay - lday > 90) }
    assert(rows.map(_.getLong(1)).sum === labeled.length.toLong, "cohorts partition customers")
    // cohorts compared positionally: both sides sorted by cohort quarter
    val expected = labeled.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, members) =>
      val ser = members.groupBy(_._2).map { case (t, xs) =>
        (t, xs.count(_._3).toLong, xs.length.toLong) }.toSeq.sortBy(_._1)
      var sm = 1000L; var prevT = 0L; var area = 0L; var churned = 0L
      ser.foreach { case (t, d, _) =>
        if (d > 0) {
          val atRisk = ser.filter(_._1 >= t).map(_._3).sum
          area += (t - prevT) * sm
          sm = (sm * (atRisk - d)) / atRisk
          prevT = t; churned += d
        }
      }
      (members.length.toLong, churned, sm, area)
    }
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, (n, churned, sm, area)) =>
      assert(r.getLong(1) === n, "cohort size")
      assert(r.getLong(2) === churned, "churned")
      assert(r.getLong(3) === sm, "final S")
      assert(r.getLong(4) === area, "area")
    }
  }

  test("q94: digit counts conserve the table and chi2 recomputes exactly") {
    val rows = SparkEntry.queries("q94_benford_audit")(spark, sf).collect()
    assert(rows.length === 9)
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === n, "digit histogram must conserve orders")
    val counts = Tables.orders(spark, sf)
      .select(floor($"o_totalprice").cast("long")).as[Long].collect()
      .groupBy(_.toString.head.asDigit.toLong).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (dg, nd, exp) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(nd === counts.getOrElse(dg, 0L), s"digit $dg count")
      val ed = n * exp / 1000L
      assert(r.getLong(4) === 1000000L * (nd - ed) * (nd - ed) / math.max(ed, 1L))
    }
  }

  test("q95: DiD identity holds and cells cover both periods") {
    val r = SparkEntry.queries("q95_diff_in_diff")(spark, sf).head()
    val n = Tables.orders(spark, sf)
      .filter(year($"o_orderdate").isin(1995, 1996)).count()
    assert(r.getLong(0) === n, "all in-window orders must land in a cell")
    val (tPre, tPost, cPre, cPost) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(r.getLong(5) === (tPost - tPre) - (cPost - cPre), "DiD identity")
    Seq(tPre, tPost, cPre, cPost).foreach(v => assert(v > 0L, "every cell observed"))
  }

  test("q96: allocation conserves every order's header amount to the cent") {
    val rows = SparkEntry.queries("q96_prorate_allocation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ok, lines) =>
      assert(lines.map(_._3).sum === lines.head._2,
        s"order $ok: allocated cents must equal the header discount exactly")
    }
  }

  test("q97: the doubled U statistics satisfy U1 + U2 = 2*n1*n2") {
    val r = SparkEntry.queries("q97_mann_whitney")(spark, sf).head()
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    assert(n1 > 0 && n2 > 0)
    assert(r.getLong(2) + r.getLong(3) === 2 * n1 * n2, "Mann-Whitney identity")
    assert(r.getLong(2) >= 0 && r.getLong(3) >= 0, "U statistics are nonnegative")
  }

  test("q98: Gini matches the sorted-values formula recomputed brute force") {
    val rows = SparkEntry.queries("q98_gini_concentration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val per = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("rev"))
      .select($"c_mktsegment", $"rev").as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val xs = per(r.getString(0)).map(_._2).sorted
      val n = xs.length.toLong
      val t = xs.sum
      val s2 = xs.zipWithIndex.map { case (x, i) => 2L * (i + 1) * x }.sum
      assert(r.getLong(1) === n && r.getLong(2) === t)
      assert(r.getLong(3) === (1000L * (s2 - (n + 1) * t)) / (n * t), r.getString(0))
      assert(r.getLong(3) >= 0L && r.getLong(3) < 1000L)
    }
  }

  test("q99: the CUSUM recurrence replays exactly from the output series") {
    val rows = SparkEntry.queries("q99_cusum_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    val xs = rows.map(_.getLong(1))
    val mean = xs.sum / xs.length
    val slack = mean / 20
    var g = 0L
    rows.foreach { r =>
      g = math.max(0L, g + r.getLong(1) - mean - slack)
      assert(r.getLong(2) === g, s"g at ${r.get(0)}")
      assert(r.getBoolean(3) === (g > 3 * mean))
    }
  }

  test("q100: conversion latency percentiles are ordered and count converters") {
    val r = SparkEntry.queries("q100_time_to_convert")(spark, sf).head()
    assert(r.getLong(0) > 0L, "fixture must contain view->purchase conversions")
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3),
      "p50 <= p90 <= max")
    assert(r.getLong(1) >= 0L)
  }

  test("q101: the migration matrix partitions the active customer base") {
    val rows = SparkEntry.queries("q101_segment_migration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val active = Tables.orders(spark, sf)
      .filter(year($"o_orderdate").isin(1995, 1996))
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum === active,
      "every active customer lands in exactly one matrix cell")
    // both-inactive is impossible by construction (only active customers enter)
    assert(!rows.exists(r => r.getString(0) == "inactive" && r.getString(1) == "inactive"))
  }

  test("q84: RFM segments partition the customer base exactly") {
    val rows = SparkEntry.queries("q84_rfm_segmentation")(spark, sf).collect()
    assert(rows.nonEmpty)
    val segTotal = rows.map(_.getLong(1)).sum
    val nCust = Tables.orders(spark, sf).select($"o_custkey").distinct().count()
    assert(segTotal === nCust, "every customer lands in exactly one segment")
    rows.foreach { r =>
      assert(r.getLong(2) > 0L && r.getLong(3) > 0L, "segment money must be positive")
      assert(r.getLong(4) >= 0L && r.getLong(5) >= 1000L, "avg frequency >= 1 order")
    }
  }
}

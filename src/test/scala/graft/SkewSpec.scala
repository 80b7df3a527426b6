package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Skew handling: explicit salting must preserve join results while
  * spreading a hot key over many reducers; AQE's runtime skew split is
  * the automatic first line of defense. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals the plain join and spreads the hot key") {
    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold"
    val noCoalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(noBroadcast)
    val prevC = spark.conf.getOption(noCoalesce)
    spark.conf.set(noBroadcast, "-1") // force a shuffle join
    spark.conf.set(noCoalesce, "false") // keep reducer boundaries observable
    try {
      // 50k rows on one hot key + 5k spread over 1000 keys
      val fact = spark.range(50000).select(lit(1L).as("k"), $"id".as("payload"))
        .union(spark.range(5000).select(($"id" % 1000 + 2).as("k"), $"id".as("payload")))
      val dim = spark.range(1002).select($"id".as("k"), concat(lit("d"), $"id").as("tag"))
      val plain = fact.join(dim, "k")
      val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8)
      // identical result set
      assert(salted.count() === plain.count())
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      // the hot key's rows really spread: count partitions holding k=1 rows
      // the hot key's rows really spread: with 8 salts over the test
      // session's 4 shuffle partitions, k=1 must occupy >= 3 reducers
      // (a plain join puts it in exactly 1)
      val hotSpread = salted.filter($"k" === 1L)
        .rdd.mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)
      assert(hotSpread >= 3, s"hot key landed in only $hotSpread partitions")
      val plainSpread = plain.filter($"k" === 1L)
        .rdd.mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)
      assert(plainSpread === 1, s"plain join should concentrate the hot key, got $plainSpread")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(noBroadcast, v)
        case None => spark.conf.unset(noBroadcast)
      }
      prevC match {
        case Some(v) => spark.conf.set(noCoalesce, v)
        case None => spark.conf.unset(noCoalesce)
      }
    }
  }

  test("saltedEquiJoinBy spreads BIT-IDENTICAL hot rows by their discriminator") {
    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold"
    val noCoalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(noBroadcast)
    val prevC = spark.conf.getOption(noCoalesce)
    spark.conf.set(noBroadcast, "-1")
    spark.conf.set(noCoalesce, "false")
    try {
      // 20k duplicate log lines: same key, same payload — the row-hash salt
      // of the base form sends ALL of them to one reducer; the ingest
      // offset discriminator spreads them. (Values ride a non-foldable
      // `when` over id so every row is bit-identical yet Catalyst cannot
      // constant-fold the salt — literal columns, and even id*0 arithmetic,
      // fold to a constant that prunes the join into a 1-row filter with
      // no shuffle left to observe.)
      val fact = spark.range(20000).select($"id".as("offset"),
        when($"id" >= 0, 1L).otherwise(2L).as("k"),
        when($"id" >= 0, "dup line").otherwise("x").as("payload"))
      val dim = spark.range(4).select($"id".as("k"), concat(lit("d"), $"id").as("tag"))
      def reducersOf(df: org.apache.spark.sql.DataFrame): Int =
        df.filter($"k" === 1L).rdd.mapPartitions(it => Iterator(it.size))
          .collect().count(_ > 0)
      val base = SkewJoin.saltedEquiJoin(fact.drop("offset"), dim, "k", salts = 8)
      assert(reducersOf(base) === 1,
        "identical rows must collapse to one salt in the base form (the documented limitation)")
      val byOffset = SkewJoin.saltedEquiJoinBy(fact, dim, "k", salts = 8, $"offset")
      assert(reducersOf(byOffset) >= 3,
        "the discriminator must spread identical payloads over several reducers")
      // and the result is still exactly the plain join
      val plain = fact.join(dim, "k")
      assert(byOffset.exceptAll(plain).isEmpty && plain.exceptAll(byOffset).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(noBroadcast, v)
        case None => spark.conf.unset(noBroadcast)
      }
      prevC match {
        case Some(v) => spark.conf.set(noCoalesce, v)
        case None => spark.conf.unset(noCoalesce)
      }
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the automatic defense the salted join backstops: with skew-join
    // enabled and thresholds scaled to the test data, the hot key's
    // oversized shuffle partition must be split by OptimizeSkewedJoin —
    // visible as skew=true on the sort-merge join in the FINAL adaptive plan
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // fact side: one hot key holding ~97% of rows (>> the 64KB skew
      // threshold at 8 partitions); probe side kept small on the hot key so
      // the join's output stays bounded while the skewed SHUFFLE partition
      // is what AQE must split
      val fact = spark.range(60000).select(lit(1L).as("k"), $"id".as("payload"))
        .union(spark.range(2000).select(($"id" % 500 + 2).as("k"), $"id".as("payload")))
      val probe = spark.range(20).select(lit(1L).as("k"), $"id".as("other"))
        .union(spark.range(2000).select(($"id" % 500 + 2).as("k"), $"id".as("other")))
      // no aggregation keyed on k downstream: a grouping on the join key
      // would REQUIRE the join's hash distribution and (correctly) forbid
      // the skew split — itself a fact worth knowing when diagnosing AQE
      val joined = fact.join(probe, "k").select($"payload", $"other")
      // execute THIS QueryExecution (collect/count would wrap a new one)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

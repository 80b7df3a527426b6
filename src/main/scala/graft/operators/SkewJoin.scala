package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §2.2 joins; the brief's "salting
  * for skew" bullet). When one join key carries a disproportionate share
  * of the fact rows, a plain shuffle join lands that whole key in ONE
  * reducer. Salting splits it: each fact row gets a deterministic salt in
  * [0, salts), the (small-but-not-broadcastable) build side is replicated
  * once per salt, and the join key becomes (key, salt) — the hot key now
  * spreads over `salts` reducers. Result is exactly the plain equi-join.
  *
  * When to use which skew tool:
  *   - dim fits in memory        -> broadcast join (no shuffle at all)
  *   - runtime-detected skew     -> AQE skew-join split (on by default)
  *   - known-hot keys, dim too big to broadcast, AQE split insufficient
  *     (e.g. single giant key beyond advisory sizes) -> salt explicitly
  */
object SkewJoin {

  /** Example (run verbatim by DocExamplesSpec): salted result equals the
    * plain equi-join, with the hot key spread over several reducers:
    * {{{
    * val fact  = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    * val build = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    * val salted = SkewJoin.saltedEquiJoin(fact, build, "k", salts = 4)
    * salted.orderBy("k", "v").collect() ==
    *   fact.join(build, "k").orderBy("k", "v").collect()
    * }}}
    */
  def saltedEquiJoin(fact: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("__salt") && !build.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
    // deterministic per-row salt: hash of the whole row spreads uniformly
    // regardless of key skew and stays stable across retries. Limitation:
    // a hot key whose rows are bit-identical (duplicate log lines) all hash
    // to ONE salt and are not spread — dedup first (d01/d07) or add a
    // distinguishing column (ingest offset) before salting; a row index
    // (spark_partition_id / monotonically_increasing_id) is NOT used here
    // because it is not stable across task retries and would make the join
    // nondeterministic.
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts.toLong)))
    val saltedBuild = build.withColumn(
      "__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** [[saltedEquiJoin]] for fact tables whose hot rows may be bit-identical
    * (duplicate log lines): the caller names a `discriminator` column that
    * distinguishes physical rows — an ingest offset, a Kafka (partition,
    * offset), a file (path, row-in-file) — and the salt hashes it alongside
    * the row, so even identical payloads spread over all `salts` reducers.
    * The discriminator must be retry-stable (carried IN the data, not
    * minted at read time): `monotonically_increasing_id` or
    * `spark_partition_id` would re-deal rows across task retries and make
    * the join nondeterministic, which is exactly why the base form refuses
    * to mint one itself.
    *
    * Example (run verbatim by DocExamplesSpec): identical hot rows spread
    * by their ingest offset, result still the plain join:
    * {{{
    * val fact  = Seq((0L, 1L, "x"), (1L, 1L, "x"), (2L, 1L, "x"), (3L, 2L, "y"))
    *   .toDF("offset", "k", "v")
    * val build = Seq((1L, "p"), (2L, "q")).toDF("k", "w")
    * val j = SkewJoin.saltedEquiJoinBy(fact, build, "k", salts = 4, $"offset")
    * j.orderBy("offset").collect() ==
    *   fact.join(build, "k").orderBy("offset").collect()
    * }}}
    */
  def saltedEquiJoinBy(fact: DataFrame, build: DataFrame, key: String,
      salts: Int, discriminator: org.apache.spark.sql.Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("__salt") && !build.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(struct(fact.columns.map(col) :+ discriminator: _*)),
        lit(salts.toLong)))
    val saltedBuild = build.withColumn(
      "__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }
}

package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

/** The custom codegen'd CosineMilliExpr must be bit-identical to the
  * interpreted zip_with/aggregate formulation (which in turn matches
  * DuckDB's list_dot_product — the cross-engine hash contract). */
class VectorExprSpec extends SparkSpec {

  import spark.implicits._

  test("fused cosine expression is bit-identical to the interpreted form") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500) { i =>
      (i.toLong,
        Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
        Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select($"id",
      VectorFns.cosineMilli($"a", $"b").as("fused"),
      VectorFns.cosineMilliInterpreted($"a", $"b").as("interp"))
      .filter($"fused" =!= $"interp")
    assert(diff.count() === 0L)
  }

  test("fused cosine expression matches on the real embeddings table") {
    val e = Tables.embeddings(spark, sf)
    val b = e.select($"vec_id".as("vb"), $"embedding".as("eb"))
    val diff = e.join(b, $"vec_id" < $"vb")
      .select(
        VectorFns.cosineMilli($"embedding", $"eb").as("fused"),
        VectorFns.cosineMilliInterpreted($"embedding", $"eb").as("interp"))
      .filter($"fused" =!= $"interp")
    assert(diff.count() === 0L)
  }

  test("cosine_milli registers as a SQL function") {
    org.apache.spark.sql.graft.Bridge.registerCosineMilli(spark)
    Tables.embeddings(spark, sf).limit(3).createOrReplaceTempView("emb_tmp")
    val rows = spark.sql(
      "SELECT cosine_milli(embedding, embedding) AS c FROM emb_tmp")
      .collect().map(_.getLong(0))
    assert(rows.forall(_ === 1000L), rows.toSeq) // cos(v, v) = 1.000
  }

  test("GraftExtensions injects cosine_milli at session build time") {
    // sessions here arrive pre-built, so apply the extensions object to a
    // fresh SparkSessionExtensions and check what a new session would get
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val names = org.apache.spark.sql.graft.Bridge.injectedFunctionNames(ext)
    assert(names.contains("cosine_milli"), names.filterNot(_.head.isLetter))
  }

  test("fused cosine participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf).limit(10)
    val b = e.select($"vec_id".as("vb"), $"embedding".as("eb"))
    val plan = e.join(b, $"vec_id" =!= $"vb")
      .select(VectorFns.cosineMilli($"embedding", $"eb").as("c"))
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(plan.contains("WholeStageCodegen"), plan.take(1500))
  }

  test("poly_hash expression is bit-identical to the interpreted form") {
    import graft.functions.TextFns
    // synthetic strings covering empties, whitespace, BMP unicode, long
    // runs — plus every doc in the fixture corpus
    val synth = Seq("", " ", "a", "abc", "The quick brown fox!",
      "tabs\tand\nnewlines", "中文字符串", "mixed 中文 and ascii 123",
      "x" * 5000).toDF("s")
    val fixture = Tables.documents(spark, sf).select($"text".as("s"))
    for (df <- Seq(synth, fixture)) {
      val diff = df.select(
        TextFns.polyHash($"s").as("fused"),
        TextFns.polyHashInterpreted($"s").as("interp"))
        .filter($"fused" =!= $"interp")
      assert(diff.count() === 0L)
    }
    // null in, null out — matching the builtin formulation
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextFns.polyHash($"s")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("cdc_boundaries expression is bit-identical to the declarative HOF form") {
    import graft.functions.TextFns
    // the formulation the DuckDB oracle mirrors (list_filter/list_reduce),
    // kept as the equivalence gate for the fused loop
    val hof = expr(
      """CASE WHEN length(s) >= 9 THEN
           filter(sequence(8, length(s) - 1),
             i -> aggregate(sequence(i - 7, i), 0L,
                    (acc, j) -> (acc * 31 + ascii(substring(s, j, 1))) % 2147483647)
                  % 64 = 0)
         ELSE CAST(array() AS ARRAY<INT>) END""")
    val synth = Seq("", " ", "a" * 7, "b" * 8, "c" * 9,
      "the quick brown fox jumps over the lazy dog " * 20,
      "中文字符串与 ascii mixed " * 30).toDF("s")
    val fixture = Tables.documents(spark, sf)
      .select(TextFns.normalize($"text").as("s"))
    for (df <- Seq(synth, fixture)) {
      val diff = df.select(TextFns.cdcBoundaries($"s").as("fused"), hof.as("interp"))
        .filter(!($"fused" <=> $"interp")).count()
      assert(diff === 0L)
    }
  }

  test("simhash64 expression is bit-identical to the JVM reference kernel") {
    import graft.functions.TextFns
    // the d04 typed-map kernel this expression replaced, kept as the oracle
    def refSimhash(toks: Seq[String]): Long = {
      def fnv64(str: String): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < str.length) { h ^= str.charAt(i); h *= 0x100000001b3L; i += 1 }
        h
      }
      val votes = new Array[Int](64)
      toks.foreach { tk =>
        val h = fnv64(tk)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    // random corpora, including empty docs and unicode
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(s"tok${rnd.nextInt(500)}é") ++
        (if (n == 0) Seq("") else Nil))
    }
    val got = docs.toDF("id", "t")
      .select($"id", TextFns.simhash64($"t").as("sig"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, toks) =>
      assert(got(id) === refSimhash(toks), s"doc $id")
    }
    // and on the real corpus via the full d04 pipeline (tokens -> sig)
    val real = Tables.documents(spark, sf)
      .select($"doc_id", TextFns.tokens($"text").as("t"))
    val exprSide = real.select($"doc_id", TextFns.simhash64($"t").as("sig"))
      .as[(Long, Long)].collect().toMap
    real.as[(Long, Seq[String])].collect().foreach { case (id, toks) =>
      assert(exprSide(id) === refSimhash(toks), s"doc $id")
    }
  }

  test("fused sign-LSH bucket is bit-identical to the interpreted form") {
    val planes = VectorFns.hyperplanes(8, 64)
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(400)(i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("id", "v")
    val diff = df.select($"id",
      VectorFns.signLshBucket($"v", planes).as("fused"),
      VectorFns.signLshBucketInterpreted($"v", planes).as("interp"))
      .filter($"fused" =!= $"interp")
    assert(diff.count() === 0L)
    // and on the real embeddings table
    val e = Tables.embeddings(spark, sf)
    val d2 = e.select(
      VectorFns.signLshBucket($"embedding", planes).as("fused"),
      VectorFns.signLshBucketInterpreted($"embedding", planes).as("interp"))
      .filter($"fused" =!= $"interp")
    assert(d2.count() === 0L)
  }

  test("simhash64 registers as a SQL function and the extensions object injects it") {
    import graft.functions.TextFns
    org.apache.spark.sql.graft.Bridge.registerSimHash64(spark)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(org.apache.spark.sql.graft.Bridge.injectedFunctionNames(ext)
      .contains("simhash64"))
    Tables.documents(spark, sf).limit(20).createOrReplaceTempView("docs_sh_tmp")
    val viaSql = spark.sql(
      "SELECT simhash64(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) AS h FROM docs_sh_tmp")
      .collect().map(_.getLong(0))
    val viaCol = Tables.documents(spark, sf).limit(20)
      .select(TextFns.simhash64(TextFns.tokens($"text"))).collect().map(_.getLong(0))
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("poly_hash registers as a SQL function and matches the Column form") {
    org.apache.spark.sql.graft.Bridge.registerPolyHash(spark)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(org.apache.spark.sql.graft.Bridge.injectedFunctionNames(ext)
      .contains("poly_hash"))
    Tables.documents(spark, sf).limit(20).createOrReplaceTempView("docs_tmp")
    val diff = spark.sql(
      "SELECT poly_hash(text) AS h FROM docs_tmp").collect().map(_.getLong(0))
      .zip(Tables.documents(spark, sf).limit(20)
        .select(graft.functions.TextFns.polyHash($"text")).collect().map(_.getLong(0)))
      .filter { case (a, b) => a != b }
    assert(diff.isEmpty)
  }
}

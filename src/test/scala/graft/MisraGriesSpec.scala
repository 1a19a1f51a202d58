package graft

import graft.operators.TextAnalysis
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** Contracts of the Misra-Gries candidate sketch and the exact two-pass
  * heavy-hitter operator built on it: the superset guarantee that makes
  * pass 2 exact, determinism across partition layouts (sketch contents may
  * differ, final output must not), and analysis-time misuse failure.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed corpus: "hot" ≈ 23%, "warm" ≈ 8%, a mid tier ≈ 1.5% each, and
    * a long unique tail — thresholds at k=10 (10%) and k=50 (2%) split the
    * tiers differently, so both guarantee directions get exercised.
    */
  private def skewedDocs = {
    val words =
      Seq.fill(300)("hot") ++ Seq.fill(100)("warm") ++
        (0 until 10).flatMap(i => Seq.fill(20)(s"mid$i")) ++
        (0 until 700).map(i => s"tail$i")
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(words)
    shuffled.grouped(13).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  private def naiveHitters(df: org.apache.spark.sql.DataFrame,
                           k: Int): Map[String, Long] = {
    val tok = df.select(explode(TextAnalysis.tokens(col("text"))).as("term"))
    val total = tok.count()
    tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("heavyHitters equals the naive full groupBy, at two thresholds") {
    val df = skewedDocs
    for (k <- Seq(10, 50)) {
      val expected = naiveHitters(df, k)
      val got = TextAnalysis.heavyHitters(df, "text", k, capacity = 256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"k=$k: exact result matches naive plan")
      assert(expected.nonEmpty, s"k=$k exercises a non-empty result")
    }
  }

  test("result is invariant to partition layout (sketch contents are not)") {
    val df = skewedDocs
    val reference = TextAnalysis
      .heavyHitters(df.repartition(1), "text", k = 25, capacity = 128)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (parts <- Seq(3, 7, 17)) {
      val got = TextAnalysis
        .heavyHitters(df.repartition(parts), "text", k = 25, capacity = 128)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == reference, s"$parts partitions: identical exact output")
    }
  }

  test("superset guarantee holds at the minimum legal capacity (= k)") {
    val df = skewedDocs
    val expected = naiveHitters(df, 10)
    val got = TextAnalysis.heavyHitters(df, "text", k = 10, capacity = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected,
      "capacity = k is exactly the MG bound n/(capacity+1) < n/k")
  }

  test("sketch keeps a dominant key through overflow in SQL form") {
    GraftExtensions.register(spark)
    // 40 occurrences of key 1 among 60 distinct fillers, capacity 4: every
    // decrement removes ≤ 1 from key 1 per filler, 40 > 60/(4+1) so it must
    // survive any merge order
    val rows = (Seq.fill(40)(1L) ++ (100L until 160L)).map(Tuple1(_))
    val df = rows.toDF("k").repartition(5)
    val keys = df.agg(expr("misra_gries_keys(array(k), 4)")).head()
      .getSeq[Long](0)
    assert(keys.contains(1L), s"dominant key survives, got $keys")
    assert(keys.size <= 4, "buffer never exceeds capacity")
  }

  test("misuse fails at analysis, not in the executor") {
    GraftExtensions.register(spark)
    val df = Seq(Tuple1("notanarray")).toDF("s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("misra_gries_keys(s, 8)")).collect()
    }
    intercept[IllegalArgumentException] {
      df.select(expr("misra_gries_keys(array(1), s)")).collect()
    }
  }

  test("heavyHitters rejects a capacity below k") {
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(skewedDocs, "text", k = 100, capacity = 50)
    }
  }

  test("vocabularyDrift matches the hand-computed KL; zero for a mirror source") {
    val df = Seq(
      ("srcA", "x x x y"), ("srcB", "x y y y"),
      ("srcC", "x x y y")) // mirrors the corpus blend exactly
      .toDF("source", "text")
    // totals: x=6, y=6 of 12 → with k=2 (freq ≥ 1/2) both make the vocab?
    // no: threshold is cnt*2 >= 12 → cnt >= 6 → both exactly at the cut
    val out = TextAnalysis.vocabularyDrift(df, "source", "text", k = 2,
        capacity = 8)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("kl"), r.getAs[Long]("n_terms"))).toMap
    val expA = 0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    assert(math.abs(out("srcA")._1 - expA) < 1e-12 && out("srcA")._2 == 2L)
    assert(math.abs(out("srcB")._1 - expA) < 1e-12,
      "mirror-skewed source drifts by the same amount")
    assert(out("srcC")._1 == 0.0,
      "a source matching the corpus blend has exactly zero KL")
  }

  test("heavyHitters on an empty corpus returns an empty result") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.heavyHitters(empty, "text", k = 10).count() == 0L)
  }

  test("sketch aggregates incrementally over a stream (candidate pass)") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    // the candidate pass ports to streaming unchanged: the typed buffer
    // merges per micro-batch in complete mode, so a live corpus feed can
    // maintain heavy-hitter candidates without a full recount
    val mem = MemoryStream[String]
    val agged = mem.toDF().toDF("text")
      .select(transform(TextAnalysis.tokens(col("text")),
        t => xxhash64(t)).as("h"))
      .agg(expr("misra_gries_keys(h, 16)").as("cand"))
    val q = agged.writeStream.format("memory")
      .queryName("mg_stream_out").outputMode("complete").start()
    mem.addData("hot hot hot filler1 filler2", "hot hot filler3 filler4")
    q.processAllAvailable()
    mem.addData("hot hot hot hot filler5 filler6 filler7")
    q.processAllAvailable()
    q.stop()
    val cand = spark.table("mg_stream_out").head().getSeq[Long](0)
    val hotHash = spark.sql("SELECT xxhash64('hot')").head().getLong(0)
    assert(cand.contains(hotHash),
      "dominant token survives cross-batch sketch merges")
  }

  // ---- Count-Min sketch (CountMinSketchExpr) ----

  /** Skewed fixture: key i occurs ~1000/(i+1) times — Zipf-ish. */
  private def cmsFixture = {
    import spark.implicits._
    (0 until 200).flatMap(i => Seq.fill(1000 / (i + 1))(i.toLong))
      .toDF("k")
  }

  test("cms estimates never undercount and stay inside the epsilon bound") {
    graft.plans.GraftExtensions.register(spark)
    val df = cmsFixture
    val n = df.count()
    val sketch = df.agg(expr("cms_sketch(k, 4, 1024)")).head()
      .getAs[Array[Byte]](0)
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((k, c) <- exact) {
      val est = graft.plans.CountMinSketchAgg.estimate(sketch, k)
      assert(est >= c, s"key $k: estimate $est undercounts exact $c")
      assert(est <= c + 3 * n / 1024,
        s"key $k: estimate $est breaches the epsilon bound (exact $c)")
    }
  }

  test("cms is linear: partition merges are elementwise, layout-invariant") {
    graft.plans.GraftExtensions.register(spark)
    val df = cmsFixture
    def sketchOf(d: org.apache.spark.sql.DataFrame): Array[Byte] =
      d.agg(expr("cms_sketch(k, 4, 512)")).head().getAs[Array[Byte]](0)
    val full = sketchOf(df)
    // byte-identical regardless of partitioning (the determinism pin)
    assert(java.util.Arrays.equals(full, sketchOf(df.repartition(7))) &&
      java.util.Arrays.equals(full, sketchOf(df.repartition(2))),
      "sketch must not depend on partition layout")
    // linearity: sketch(A ∪ B) = sketch(A) + sketch(B), cell by cell
    val (dA, wA, a) = graft.plans.CountMinSketchAgg
      .deserializeCells(sketchOf(df.filter(col("k") < 50)))
    val (_, _, b) = graft.plans.CountMinSketchAgg
      .deserializeCells(sketchOf(df.filter(col("k") >= 50)))
    val (_, _, f) = graft.plans.CountMinSketchAgg.deserializeCells(full)
    assert(dA == 4 && wA == 512)
    assert(f.indices.forall(i => f(i) == a(i) + b(i)),
      "union sketch must equal the elementwise sum of part sketches")
  }

  test("cms maintains live frequencies over a stream (complete mode)") {
    graft.plans.GraftExtensions.register(spark)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Long]
    val agged = mem.toDS().toDF("k")
      .agg(expr("cms_sketch(k, 4, 256)").as("sk"))
    val q = agged.writeStream.format("memory")
      .queryName("cms_stream_out").outputMode("complete").start()
    mem.addData(Seq.fill(10)(7L) ++ Seq(1L, 2L, 3L): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(5)(7L) ++ Seq(4L, 5L): _*)
    q.processAllAvailable()
    q.stop()
    val sketch = spark.table("cms_stream_out").head().getAs[Array[Byte]](0)
    assert(graft.plans.CountMinSketchAgg.estimate(sketch, 7L) >= 15L,
      "hot key count accumulates across micro-batches")
    assert(graft.plans.CountMinSketchAgg.estimate(sketch, 99L) <= 2L,
      "absent key estimate stays near zero at this load")
  }

  test("cms_estimate scalar runs codegen-resident against a built sketch") {
    graft.plans.GraftExtensions.register(spark)
    val df = cmsFixture
    val sketch = df.agg(expr("cms_sketch(k, 4, 1024)")).head()
      .getAs[Array[Byte]](0)
    df.sparkSession.range(0, 10).select(col("id"))
      .createOrReplaceTempView("cms_probe")
    val lit = org.apache.spark.sql.functions.lit(sketch)
    val got = spark.table("cms_probe")
      .select(col("id"), org.apache.spark.sql.functions
        .call_function("cms_estimate", lit, col("id")).as("est"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"scalar stays inside codegen:\n$plan")
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- got.collect())
      assert(r.getLong(1) >= exact(r.getLong(0)),
        s"probe ${r.getLong(0)} undercounts")
  }
}

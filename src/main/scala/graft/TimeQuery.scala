package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timing harness: time a single registered query (steady-state,
  * median of 3 after a warm run) without paying Bench's full pipeline
  * phase. Not part of the driver contract.
  *
  * usage: runMain graft.TimeQuery <sfDir> <querySubstring> [runs]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sub = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if name.contains(sub)) {
      val times = (0 until (runs + 1)).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted // drop warm run (codegen/analysis)
      val med = times(times.length / 2)
      println(f"[time] $name%-28s median $med%.3f s  runs ${
        times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}

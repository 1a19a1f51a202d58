package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: print the formatted physical plan of a
  * registered query. Not part of the driver contract.
  *
  * usage: runMain graft.ExplainQuery <sfDir> <querySubstring>
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if name.contains(args(1)))
      println(s"=== $name ===\n" +
        fn(spark, args(0)).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}

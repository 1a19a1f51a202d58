package graft

import graft.core.Tables
import graft.queries.{ExtensionQueries, RelationalQueries, WarehouseQueries, WindowQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2.4/§2.5): each entry is a
  * DataFrame-API implementation; `oracleSql` carries the equivalent ANSI SQL
  * the driver runs in DuckDB over the same parquet tables. Queries without a
  * portable SQL form (sketch/heuristic operators) are rows-only checks,
  * pinned by exact assertions in the ScalaTest suite.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan -> partial agg -> final agg -> sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"))
      .orderBy("l_returnflag", "l_linestatus")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ WindowQueries.defs ++ ExtensionQueries.defs ++
      WarehouseQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.sql ++ WindowQueries.sql ++ ExtensionQueries.sql ++
      WarehouseQueries.sql
}

package graft.operators

import scala.collection.immutable.ListMap

import graft.core.{GraftConfig, Json, Rules}
import graft.sources.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline orchestration (reference O22–O24: src/run.py:60-340): per input
  * — normalize → QA report → per timeframe: gap repair then resample →
  * export with sidecar + NDJSON log. Each stage is isolated so one
  * file/timeframe failing never stops the run (src/run.py:74,189,249,252).
  *
  * The transform graph stays lazy end-to-end; the normalized frame is
  * cached before the multi-timeframe fan-out so the rename/cast/tz/dedup
  * work executes once, not once per timeframe.
  */
object Runner {

  val TsCol: String = Normalize.TsCol

  private val timing = sys.env.get("GRAFT_TIMING").contains("1")
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (timing)
      System.err.println(f"[graft-timing] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** O22: symbol inference — first value of a symbol-ish column, else the
    * basename prefix before '_' (src/run.py:31-49).
    */
  def inferSymbol(df: DataFrame, fallback: String): String = {
    val candidates = Set("symbol", "ticker", "pair", "instrument", "sym")
    df.columns.find(c => candidates.contains(c.toLowerCase)) match {
      case Some(c) =>
        df.select(col(c)).filter(col(c).isNotNull).limit(1)
          .collect().headOption.map(_.get(0).toString.toUpperCase)
          .getOrElse(fallbackSymbol(fallback))
      case None => fallbackSymbol(fallback)
    }
  }

  private def fallbackSymbol(basename: String): String =
    (if (basename.contains("_")) basename.split("_")(0) else basename).toUpperCase

  /** O23: output name `{symbol}_{minYYYYMMDD}_{maxYYYYMMDD}` + timeframe
    * suffix (src/run.py:280-302).
    */
  def outputBasename(df: DataFrame, symbol: String): String = {
    val r = df.agg(min(col(TsCol)).as("_t0"), max(col(TsCol)).as("_t1"))
      .collect()(0)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd").withZone(java.time.ZoneOffset.UTC)
    val t0 = Option(r.getAs[java.sql.Timestamp]("_t0"))
      .map(t => fmt.format(t.toInstant)).getOrElse("NA")
    val t1 = Option(r.getAs[java.sql.Timestamp]("_t1"))
      .map(t => fmt.format(t.toInstant)).getOrElse("NA")
    s"${symbol}_${t0}_$t1"
  }

  final case class StageResult(name: String, rows: Long, path: String)
  final case class RunResult(
      symbol: String,
      normalizationReport: ListMap[String, Any],
      qualityReport: ListMap[String, Any],
      exports: Seq[StageResult],
      errors: Seq[(String, String)])

  /** O24: process one input frame end-to-end (src/run.py:60-253). */
  def processDataFrame(spark: SparkSession, input: DataFrame,
                       cfg: GraftConfig, sourceTz: Option[String],
                       basename: String, outDir: String,
                       computeReports: Boolean = true): RunResult = {

    var errors = Vector.empty[(String, String)]

    // symbol inference + injection (src/run.py:304-319)
    val symbol = inferSymbol(input, basename)
    val injected =
      if (input.columns.exists(_.equalsIgnoreCase("SYMBOL")))
        input.withColumn("SYMBOL", upper(col("SYMBOL")))
      else input.withColumn("SYMBOL", lit(symbol))

    val normalized = timed("normalize")(
      Normalize(injected, cfg.columnsMap, cfg.requiredColumns,
        sourceTz.orElse(cfg.sourceTzDefault), cfg.targetTz,
        computeReport = computeReports))
    // cache before the per-timeframe fan-out — the reference re-reads its
    // in-memory frame for free; Spark must not re-run the normalize graph
    // once per timeframe.
    val ndf = normalized.unsorted.cache()
    timed("materialize_cache")(ndf.count())
    if (timing)
      System.err.println(s"[graft-timing] ndf partitions: ${ndf.rdd.getNumPartitions}")
    normalized.unpersistSource()

    val quality =
      if (computeReports)
        try timed("quality_report")(
          Reporting.dataQualityReport(ndf, knownDistinctTs = true))
        catch { case e: Exception => errors :+= "quality_report" -> e.getMessage
          ListMap.empty[String, Any] }
      else ListMap.empty[String, Any]
    if (computeReports && cfg.saveReports)
      try Reporting.saveReport(quality, s"$outDir/reports/${basename}_quality.json")
      catch { case e: Exception => errors :+= "save_report" -> e.getMessage }

    val timeframes = if (cfg.timeframes.nonEmpty) cfg.timeframes else Seq("1T")
    var exports = Vector.empty[StageResult]
    // one extent for all timeframes — reuse the quality report's start/end
    // instead of re-scanning
    val baseName = (quality.get("start"), quality.get("end")) match {
      case (Some(s0: String), Some(e0: String)) =>
        val d0 = s0.take(10).replace("-", "")
        val d1 = e0.take(10).replace("-", "")
        s"${symbol}_${d0}_$d1"
      case _ => timed("output_basename")(outputBasename(ndf, symbol))
    }

    for (tf <- timeframes) {
      try {
        // gap repair at the target rule, then resample (src/run.py:194-216;
        // the faithful grid-align order — §2.2.4). The resampled frame is
        // cached: export runs three actions (validate agg, write, hash) and
        // must not re-execute the repair window chain for each.
        val repaired = cfg.gapPolicy match {
          case Some(gp) =>
            timed(s"repair_$tf")(Gaps.repairGaps(ndf, tf, gp.useFfillFor,
              gp.interpolatePrices, gp.shortGapMinutes,
              computeReport = computeReports, cacheResult = true).df)
          case None => ndf
        }
        // repaired at the same rule => one row per bucket => the resample
        // aggregation degenerates to a projection (no shuffle)
        val res = Resample.resampleOhlc(repaired, tf,
          inputOnBucketGrid = cfg.gapPolicy.isDefined).cache()
        val name = s"${baseName}_${Rules.suffix(tf)}"
        val path = s"$outDir/$name.parquet"
        val report = timed(s"export_$tf")(
          Exporter.writeParquetWithMetadata(res, path,
            cfg.compression, cfg.partitionCols,
            Json.obj("exporter_version" -> "v1",
              "timeframe" -> tf, "symbol" -> symbol),
            knownDistinctTs = true))
        Exporter.appendExportLog(s"$outDir/exports", report)
        exports :+= StageResult(name, report("rows").asInstanceOf[Long], path)
        res.unpersist()
        if (!(repaired eq ndf)) repaired.unpersist()
      } catch {
        case e: Exception => errors :+= s"timeframe_$tf" -> e.getMessage
      }
    }

    ndf.unpersist()
    RunResult(symbol, normalized.report, quality, exports, errors)
  }

  /** EP1: full batch run over a raw directory. */
  def runBatch(spark: SparkSession, cfg: GraftConfig,
               dryRun: Boolean = true): Seq[RunResult] = {
    val scan = Readers.loadAll(spark, cfg.rawPath)
    scan.loaded.map { r =>
      if (dryRun)
        RunResult(inferSymbol(r.df, r.filename), ListMap.empty,
          ListMap.empty, Nil, Nil)
      else
        processDataFrame(spark, r.df, cfg, cfg.sourceTzDefault,
          r.filename, cfg.processedPath)
    }
  }
}

package graft.core

import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Pipeline configuration (reference: config/default.yml + the pydantic
  * model in src/etl/utils/config_model.py).
  *
  * Loaded from YAML with the jackson-dataformat-yaml shipped in Spark's
  * jars; `${ENV}` placeholders in string values expand recursively
  * (reference: src/etl/utils/config_loader.py:12-25), and the same presence
  * validation applies (`:28-40`: io.raw_path, io.processed_path,
  * parquet.compression, schema.columns_map, schema.required_columns).
  */
final case class GapPolicy(
    shortGapMinutes: Int = 5,
    useFfillFor: Seq[String] = Seq("VOLUME"),
    interpolatePrices: Boolean = true)

final case class GraftConfig(
    rawPath: String = "data/raw",
    processedPath: String = "data/processed",
    reportsPath: String = "data/reports",
    quarantinePath: String = "data/quarantine",
    compression: String = "zstd",
    partitionCols: Seq[String] = Seq("symbol", "year"),
    /** Parquet row-group size in BYTES (`parquet.block.size`); None keeps
      * Spark's default (128 MB). The reference's pyarrow knob counted ROWS
      * (config_model.py:21) — sizes don't translate, so the Spark engine
      * only honors an explicit byte value.
      */
    rowGroupSize: Option[Long] = None,
    columnsMap: ListMap[String, Seq[String]] = GraftConfig.defaultColumnsMap,
    requiredColumns: Seq[String] =
      Seq("TIMESTAMP", "OPEN", "HIGH", "LOW", "CLOSE"),
    targetTz: String = "UTC",
    sourceTzDefault: Option[String] = None,
    policyIfNa: String = "assume_utc",
    timeframes: Seq[String] = Seq("1T", "5T", "15T", "1H"),
    gapPolicy: Option[GapPolicy] = Some(GapPolicy()),
    writeMode: String = "overwrite",
    saveReports: Boolean = true,
    /** Faithful = replicate the reference's grid-align-then-resample quirk
      * (SURVEY.md §2.2.4); Correct = aggregate all source rows per bucket.
      */
    resampleMode: String = "correct")

object GraftConfig {

  val defaultColumnsMap: ListMap[String, Seq[String]] = ListMap(
    "TIMESTAMP" -> Seq("timestamp", "date", "datetime", "time", "ts"),
    "OPEN" -> Seq("open", "Open", "o", "price_open", "askopen", "bidopen"),
    "HIGH" -> Seq("high", "High", "h", "price_high"),
    "LOW" -> Seq("low", "Low", "l", "price_low"),
    "CLOSE" -> Seq("close", "Close", "c", "price_close"),
    "VOLUME" -> Seq("volume", "vol", "tickvol", "Volume"),
    "BID" -> Seq("bid", "Bid"),
    "ASK" -> Seq("ask", "Ask"))

  def load(path: String): GraftConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper
      .readValue(Files.readString(Paths.get(path)), classOf[java.util.Map[String, Object]])
    fromMap(expandEnv(root).asInstanceOf[java.util.Map[String, Object]])
  }

  /** Recursive ${ENV} expansion on string values. */
  private def expandEnv(x: Object): Object = x match {
    case s: String =>
      "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r.replaceAllIn(s,
        m => sys.env.getOrElse(m.group(1), ""))
    case m: java.util.Map[_, _] =>
      val out = new java.util.LinkedHashMap[Object, Object]()
      m.asScala.foreach { case (k, v) =>
        out.put(k.asInstanceOf[Object], expandEnv(v.asInstanceOf[Object]))
      }
      out
    case l: java.util.List[_] =>
      l.asScala.map(v => expandEnv(v.asInstanceOf[Object])).asJava
    case other => other
  }

  private def fromMap(root: java.util.Map[String, Object]): GraftConfig = {
    def section(name: String): Map[String, Object] =
      Option(root.get(name))
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
        .getOrElse(Map.empty)
    def str(m: Map[String, Object], k: String): Option[String] =
      m.get(k).filter(_ != null).map(_.toString)
    def strs(x: Object): Seq[String] =
      x.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq

    val io = section("io")
    val parquet = section("parquet")
    val schema = section("schema")
    val tz = section("timezone")
    val resample = section("resample")
    val export = section("export")

    // presence validation — same required keys as the reference loader
    val missing = Seq(
      "io.raw_path" -> io.contains("raw_path"),
      "io.processed_path" -> io.contains("processed_path"),
      "parquet.compression" -> parquet.contains("compression"),
      "schema.columns_map" -> schema.contains("columns_map"),
      "schema.required_columns" -> schema.contains("required_columns")
    ).collect { case (k, false) => k }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing required config key(s): ${missing.mkString(", ")}")

    val cm = schema("columns_map").asInstanceOf[java.util.Map[String, Object]]
    val columnsMap = ListMap(cm.asScala.toSeq.map { case (k, v) => k -> strs(v) }: _*)

    val gapPolicy = resample.get("gap_policy").map { gp =>
      val m = gp.asInstanceOf[java.util.Map[String, Object]].asScala
      GapPolicy(
        shortGapMinutes =
          m.get("short_gap_minutes").map(_.toString.toInt).getOrElse(5),
        useFfillFor = m.get("use_ffill_for").map(strs).getOrElse(Seq("VOLUME")),
        interpolatePrices =
          m.get("interpolate_prices").forall(_.toString.toBoolean))
    }

    GraftConfig(
      rawPath = str(io, "raw_path").getOrElse("data/raw"),
      processedPath = str(io, "processed_path").getOrElse("data/processed"),
      reportsPath = str(io, "reports_path").getOrElse("data/reports"),
      quarantinePath = str(io, "quarantine_path").getOrElse("data/quarantine"),
      compression = str(parquet, "compression").getOrElse("zstd"),
      partitionCols = parquet.get("partition_cols").map(strs).getOrElse(Nil),
      rowGroupSize = parquet.get("row_group_size").map(_.toString.toLong),
      columnsMap = columnsMap,
      requiredColumns = strs(schema("required_columns")),
      targetTz = str(tz, "target").getOrElse("UTC"),
      sourceTzDefault = str(tz, "source_default"),
      policyIfNa = str(tz, "policy_if_na").getOrElse("assume_utc"),
      timeframes = resample.get("timeframes").map(strs).getOrElse(Nil),
      gapPolicy = gapPolicy,
      writeMode = str(export, "write_mode").getOrElse("overwrite"),
      saveReports = export.get("save_reports").forall(_.toString.toBoolean),
      resampleMode = str(resample, "mode").getOrElse("correct"))
  }
}

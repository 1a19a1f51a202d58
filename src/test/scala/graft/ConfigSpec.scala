package graft

import java.nio.file.Files

import graft.core.GraftConfig

/** YAML config loading (reference O25/O26: config_loader.py + config/
  * default.yml shape): key mapping, ${ENV} expansion, presence validation.
  */
class ConfigSpec extends SparkSpec {

  private def write(yaml: String): String = {
    val f = Files.createTempFile("graft_cfg", ".yml")
    Files.writeString(f, yaml)
    f.toString
  }

  test("default.yml shape loads with all sections") {
    val cfg = GraftConfig.load(write(
      """io:
        |  raw_path: "data/raw"
        |  processed_path: "data/processed"
        |parquet:
        |  compression: "zstd"
        |  partition_cols: ["symbol", "year"]
        |  row_group_size: 65536
        |schema:
        |  columns_map:
        |    TIMESTAMP: ["timestamp", "ts"]
        |    OPEN: ["open", "o"]
        |  required_columns: ["TIMESTAMP", "OPEN"]
        |timezone:
        |  target: "UTC"
        |  source_default: null
        |  policy_if_na: "require_source"
        |resample:
        |  timeframes: ["1T", "5T", "1H"]
        |  mode: "faithful"
        |  gap_policy:
        |    short_gap_minutes: 7
        |    use_ffill_for: ["VOLUME", "TICKVOL"]
        |    interpolate_prices: true
        |export:
        |  write_mode: "overwrite"
        |""".stripMargin))
    assert(cfg.rawPath == "data/raw")
    assert(cfg.compression == "zstd")
    assert(cfg.partitionCols == Seq("symbol", "year"))
    assert(cfg.columnsMap("TIMESTAMP") == Seq("timestamp", "ts"))
    assert(cfg.columnsMap.keys.toSeq == Seq("TIMESTAMP", "OPEN"),
      "columns_map preserves YAML order (rename precedence)")
    assert(cfg.requiredColumns == Seq("TIMESTAMP", "OPEN"))
    assert(cfg.sourceTzDefault.isEmpty)
    assert(cfg.policyIfNa == "require_source")
    assert(cfg.timeframes == Seq("1T", "5T", "1H"))
    assert(cfg.resampleMode == "faithful")
    assert(cfg.rowGroupSize.contains(65536L))
    assert(cfg.writeMode == "overwrite")
    val gp = cfg.gapPolicy.get
    assert(gp.shortGapMinutes == 7)
    assert(gp.useFfillFor == Seq("VOLUME", "TICKVOL"))
  }

  test("resample mode defaults to correct when absent") {
    val cfg = GraftConfig.load(write(
      """io: { raw_path: "r", processed_path: "p" }
        |parquet: { compression: "zstd" }
        |schema:
        |  columns_map: { TIMESTAMP: ["ts"] }
        |  required_columns: ["TIMESTAMP"]
        |""".stripMargin))
    assert(cfg.resampleMode == "correct")
    assert(cfg.rowGroupSize.isEmpty)
  }

  test("${ENV} placeholders expand in string values") {
    val cfg = GraftConfig.load(write(
      s"""io:
         |  raw_path: "$${HOME}/raw"
         |  processed_path: "out"
         |parquet: { compression: "zstd" }
         |schema:
         |  columns_map: { TIMESTAMP: ["ts"] }
         |  required_columns: ["TIMESTAMP"]
         |""".stripMargin))
    assert(cfg.rawPath == sys.env("HOME") + "/raw")
  }

  test("missing required keys raise with the key names") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.load(write(
        """io: { raw_path: "x" }
          |schema: { columns_map: { A: ["a"] } }
          |""".stripMargin))
    }
    assert(e.getMessage.contains("io.processed_path"))
    assert(e.getMessage.contains("parquet.compression"))
    assert(e.getMessage.contains("schema.required_columns"))
  }
}

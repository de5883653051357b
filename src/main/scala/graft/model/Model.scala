package graft.model

/** Pipeline metadata model, mirroring the reference's dataclasses/enums
  * (reference: etl_pipeline.py:33-85) as Scala ADTs + case classes.
  */
sealed trait PipelineStatus { def name: String }
object PipelineStatus {
  case object Pending extends PipelineStatus { val name = "PENDING" }
  case object Running extends PipelineStatus { val name = "RUNNING" }
  case object Success extends PipelineStatus { val name = "SUCCESS" }
  case object Failed extends PipelineStatus { val name = "FAILED" }
  case object Skipped extends PipelineStatus { val name = "SKIPPED" }
}

/** Source kinds (reference: etl_pipeline.py:40-45). */
sealed trait DataSourceKind { def name: String }
object DataSourceKind {
  case object CsvFile extends DataSourceKind { val name = "csv_file" }
  case object JsonApi extends DataSourceKind { val name = "json_api" }
  case object SqlDatabase extends DataSourceKind { val name = "sql_database" }
  case object ExcelFile extends DataSourceKind { val name = "excel_file" }
  case object FlatFile extends DataSourceKind { val name = "flat_file" }
  case object LogFile extends DataSourceKind { val name = "log_file" }
}

/** Per-source run metric (reference: etl_pipeline.py:48-70). */
final case class PipelineMetric(
    sourceName: String,
    sourceType: String,
    recordsIn: Long = 0L,
    recordsOut: Long = 0L,
    recordsDropped: Long = 0L,
    startTimeMs: Long = 0L,
    endTimeMs: Long = 0L,
    status: String = PipelineStatus.Pending.name,
    errorMessage: Option[String] = None) {
  def durationSeconds: Double =
    if (endTimeMs > 0 && startTimeMs > 0) (endTimeMs - startTimeMs) / 1000.0 else 0.0
  def dropRatePct: Double =
    if (recordsIn > 0) 100.0 * recordsDropped / recordsIn else 0.0
}

/** Whole-run summary (reference: etl_pipeline.py:72-85). */
final case class PipelineRun(
    runId: String,
    startTimeMs: Long,
    endTimeMs: Long = 0L,
    metrics: List[PipelineMetric] = Nil,
    totalRecords: Long = 0L,
    status: String = PipelineStatus.Running.name) {
  def uptimePct: Double =
    if (metrics.isEmpty) 0.0
    else 100.0 * metrics.count(_.status == PipelineStatus.Success.name) / metrics.size
}

/** Row persisted to the `pipeline_health` table
  * (reference: etl_pipeline.py:317-333).
  */
final case class HealthRecord(
    run_id: String,
    source_name: String,
    status: String,
    records_in: Long,
    records_out: Long,
    drop_rate_pct: Double,
    duration_sec: Double,
    run_time: String)

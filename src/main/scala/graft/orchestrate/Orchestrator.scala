package graft.orchestrate

import graft.clean.Clean
import graft.load.Warehouse
import graft.model._
import graft.sources.Generators
import graft.transform.Transforms

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.util.control.NonFatal

/** Pipeline orchestrator (reference: etl_pipeline.py:249-348).
  *
  * Runs each registered source through extract -> clean -> transform ->
  * coerce -> load, with per-source error containment (a failed source is
  * recorded FAILED and the run continues, :286-292), then appends health
  * metrics and builds a run summary.
  *
  * Each source's E-T-L is ONE lazy plan executed by the load action; row
  * counts ride along via `Dataset.observe` accumulators rather than extra
  * `count()` scans (the reference re-scans with len(), :264,:277).
  */
final class Orchestrator(spark: SparkSession, warehouse: Warehouse) {

  // audit logging per stage, mirroring the reference's file+console logger
  // (etl_pipeline.py:23-30, :260, :281-282, :290)
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[Orchestrator])

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  def runSource(
      name: String,
      sourceFn: SparkSession => DataFrame,
      table: String,
      transformName: String,
      runId: String): PipelineMetric = {
    val start = System.currentTimeMillis()
    log.info("[{}] extract -> clean -> transform -> load into {}", name, table: Any)
    try {
      val raw = sourceFn(spark)
      val cleaned = Clean.cleanCommon(raw, name)
      val transformed = Transforms(transformName, cleaned.df)
      val coerced = warehouse.coerceForLoad(transformed)
      warehouse.load(coerced, table, SaveMode.Overwrite) // the single action
      val (in, out) = Clean.counts(cleaned)
      log.info("[{}] SUCCESS in={} out={}", name, in.toString, out.toString)
      PipelineMetric(
        sourceName = name,
        sourceType = table,
        recordsIn = in,
        recordsOut = out,
        recordsDropped = in - out,
        startTimeMs = start,
        endTimeMs = System.currentTimeMillis(),
        status = PipelineStatus.Success.name)
    } catch {
      case NonFatal(e) =>
        log.error(s"[$name] FAILED: ${e.getMessage}")
        PipelineMetric(
          sourceName = name,
          sourceType = table,
          startTimeMs = start,
          endTimeMs = System.currentTimeMillis(),
          status = PipelineStatus.Failed.name,
          errorMessage = Option(e.getMessage))
    }
  }

  /** Full run over the reference's fixed source registry
    * (etl_pipeline.py:294-315). `parallel = true` submits the independent
    * source jobs concurrently on the one session (Spark schedules them
    * across the cluster fairly) — the reference is sequential, but nothing
    * in the semantics requires it and the sources share no state.
    */
  def runPipeline(
      runId: String = s"run_${System.currentTimeMillis()}",
      parallel: Boolean = false): PipelineRun = {
    val start = System.currentTimeMillis()
    val run1 = { (e: (String, SparkSession => DataFrame, String, String)) =>
      runSource(e._1, e._2, e._3, e._4, runId)
    }
    val metrics =
      if (parallel) {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(
          Future.sequence(Generators.registry.map(e => Future(run1(e))).toList),
          Duration.Inf)
      } else Generators.registry.map(run1).toList
    val run = PipelineRun(
      runId = runId,
      startTimeMs = start,
      endTimeMs = System.currentTimeMillis(),
      metrics = metrics,
      totalRecords = metrics.map(_.recordsOut).sum,
      status =
        if (metrics.forall(_.status == PipelineStatus.Success.name))
          PipelineStatus.Success.name
        else PipelineStatus.Failed.name)
    saveHealthMetrics(run)
    run
  }

  /** Append health rows to `pipeline_health`
    * (reference: etl_pipeline.py:317-333).
    */
  def saveHealthMetrics(run: PipelineRun): Unit = {
    import spark.implicits._
    val now = tsFmt.format(Instant.now())
    val rows = run.metrics.map { m =>
      HealthRecord(
        run_id = run.runId,
        source_name = m.sourceName,
        status = m.status,
        records_in = m.recordsIn,
        records_out = m.recordsOut,
        drop_rate_pct = m.dropRatePct,
        duration_sec = m.durationSeconds,
        run_time = now)
    }
    warehouse.load(rows.toDS().toDF(), "pipeline_health", SaveMode.Append)
  }

  /** Run summary (reference: etl_pipeline.py:335-348). */
  def summary(run: PipelineRun): String = {
    val lines = run.metrics.map { m =>
      f"  ${m.sourceName}%-18s ${m.status}%-8s in=${m.recordsIn}%-8d out=${m.recordsOut}%-8d ${m.durationSeconds}%.2fs"
    }
    (Seq(
      s"run ${run.runId}: ${run.status}",
      f"  uptime ${run.uptimePct}%.1f%% records ${run.totalRecords}") ++ lines)
      .mkString("\n")
  }
}

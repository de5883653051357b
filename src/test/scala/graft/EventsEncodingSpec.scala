package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver has shipped `events.ts` in two on-disk encodings — INT64
  * epoch-nanos and TIMESTAMP(MICROS) — and regenerated the testdata
  * between rounds. These tests pin the adaptive readers
  * ([[Tables.events]], [[graft.streaming.Streams.eventsStream]]) to the
  * contract that BOTH encodings land on identical (ts, ts_ns) values, so
  * the next flip cannot silently break every events-touching query
  * again.
  */
class EventsEncodingSpec extends SparkSuite {

  // one hour of events at microsecond precision, spanning a window edge
  private val rowsUs: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, 1700000000000000L, 7L, "click", 1.5, "{}"),
    (2L, 1700000000123456L, 7L, "view", 2.0, "{}"),
    (3L, 1700003599999999L, 8L, "click", 0.5, "{}"),
    (4L, 1700003600000001L, 8L, "purchase", 9.0, "{}"))

  private def writeDirs(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_enc").toString
    import spark.implicits._
    val base = rowsUs.toDF(
      "event_id", "ts_us", "user_id", "event_type", "value", "props")
    // the driver ships events.parquet as a single FILE (not a directory):
    // write to a staging dir, then move the part file into place so the
    // streaming source's pathGlobFilter probe sees the same layout
    def writeFile(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val stage = s"$root/.stage_${dest.hashCode.toHexString}" +
        s"_${System.nanoTime()}"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val destFile = new java.io.File(dest)
      destFile.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, destFile.toPath)
    }
    // TIMESTAMP(MICROS) encoding (the regenerated-driver shape)
    writeFile(
      base.select(col("event_id"),
        timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")),
      s"$root/us/events.parquet")
    // raw INT64 epoch-nanos encoding (the original shape, as the engine
    // sees it through nanosAsLong: a plain long column)
    writeFile(
      base.select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")),
      s"$root/ns/events.parquet")
    (s"$root/us", s"$root/ns")
  }

  test("batch reader lands both encodings on identical (ts, ts_ns)") {
    val (usDir, nsDir) = writeDirs()
    def norm(dir: String): Seq[Row] =
      Tables(spark, dir).events
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("ts_ns"))
        .orderBy("event_id").collect().toSeq
    val us = norm(usDir)
    val ns = norm(nsDir)
    assert(us == ns, s"encodings diverge:\n$us\nvs\n$ns")
    // spot value: exact nanosecond arithmetic domain survives the round trip
    assert(us(1).getLong(2) == 1700000000123456000L)
  }

  test("streaming source drains identical windowed counts from both encodings") {
    val (usDir, nsDir) = writeDirs()
    def counts(dir: String): Seq[Row] =
      graft.streaming.Streams
        .drainTumblingCounts(spark, dir, "events.parquet")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type").collect().toSeq
    val us = counts(usDir)
    val ns = counts(nsDir)
    assert(us == ns, s"streamed windows diverge:\n$us\nvs\n$ns")
    // the 4 events span two hourly windows with three event types
    assert(us.map(_.getLong(2)).sum == 4L)
  }
}

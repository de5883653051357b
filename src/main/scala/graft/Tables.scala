package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Readers for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All readers are plain parquet scans, so Catalyst pushes filters and
  * prunes columns down to the file scan — callers should select/filter
  * directly on these frames and let the optimizer do the rest.
  */
final case class Tables(spark: SparkSession, dir: String) {
  Engine.tune(spark)

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Raw events: `ts` is INT64 epoch-nanoseconds (see Engine.tune). */
  def eventsRaw: DataFrame = t("events")

  /** Events with `ts` converted to a naive (NTZ) timestamp at microsecond
    * precision, matching how DuckDB/pandas see the column. The raw
    * nanosecond long is kept as `ts_ns` for exact interval arithmetic.
    */
  def events: DataFrame =
    eventsRaw
      .withColumn("ts_ns", col("ts"))
      .withColumn(
        // integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
        // exact range, so float division truncates to the wrong microsecond
        "ts",
        timestamp_micros(expr("ts_ns div 1000")).cast(TimestampNTZType))

  /** Register every table as a temp view under its canonical name, making
    * the whole corpus queryable through `spark.sql` — the engine's SQL
    * frontend (Catalyst parse -> analyze -> optimize -> execute).
    */
  def createViews(): Unit = {
    region.createOrReplaceTempView("region")
    nation.createOrReplaceTempView("nation")
    customer.createOrReplaceTempView("customer")
    supplier.createOrReplaceTempView("supplier")
    part.createOrReplaceTempView("part")
    orders.createOrReplaceTempView("orders")
    lineitem.createOrReplaceTempView("lineitem")
    documents.createOrReplaceTempView("documents")
    embeddings.createOrReplaceTempView("embeddings")
    events.createOrReplaceTempView("events")
  }
}

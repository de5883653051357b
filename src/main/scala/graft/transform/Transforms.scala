package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-source transformation stages
  * (reference: etl_pipeline.py:191-225).
  *
  * All transforms are pure Column-expression pipelines — no UDFs — so every
  * stage stays inside whole-stage codegen and Catalyst can push/prune
  * around them.
  */
object Transforms {

  /** Lenient numeric coercion: unparseable -> 0
    * (reference `pd.to_numeric(errors="coerce").fillna(0)`,
    * etl_pipeline.py:193-194). With ANSI off (Engine.tune), cast is
    * try_cast: null on failure.
    */
  def toNumericOrZero(c: Column): Column = coalesce(c.cast("double"), lit(0.0))

  /** Lenient date parse: bad date -> null
    * (reference `pd.to_datetime(errors="coerce")`, etl_pipeline.py:196,213).
    */
  def toDateOrNull(c: Column): Column = c.cast("date")

  /** p90 threshold flag computed as a broadcast scalar aggregate
    * (reference `revenue > revenue.quantile(0.9)`, etl_pipeline.py:198).
    *
    * Exact `percentile` (linear interpolation) matches pandas `quantile` /
    * DuckDB `quantile_cont`; `approx_percentile` does not. The aggregate is
    * computed once and broadcast-cross-joined, not windowed over an empty
    * partitioning (which would funnel the whole table through one task).
    */
  def withQuantileFlag(
      df: DataFrame,
      valueCol: String,
      flag: String,
      p: Double = 0.9): DataFrame = {
    val q = df.agg(expr(s"percentile($valueCol, ${p}D)").as("__q"))
    df.crossJoin(broadcast(q))
      .withColumn(flag, col(valueCol) > col("__q"))
      .drop("__q")
  }

  /** Sales transform (reference: etl_pipeline.py:191-199). */
  def sales(df: DataFrame): DataFrame = {
    val coerced = df
      .withColumn("revenue", toNumericOrZero(col("revenue")))
      .withColumn("units", toNumericOrZero(col("units")))
      // div-by-zero -> null, matching pandas `replace(0, NaN)` (:195);
      // Spark double division by zero would yield Infinity.
      .withColumn(
        "revenue_per_unit",
        round(when(col("units") === 0, lit(null)).otherwise(col("revenue") / col("units")), 2))
      .withColumn("date", toDateOrNull(col("date")))
      .withColumn("month", date_format(col("date"), "yyyy-MM"))
    withQuantileFlag(coerced, "revenue", "high_value")
  }

  /** Customer transform (reference: etl_pipeline.py:201-208).
    *
    * `pd.cut` intervals are left-open/right-closed: (0,0.3] -> Low,
    * (0.3,0.6] -> Medium, (0.6,1.0] -> High, and exactly 0.0 -> null.
    * `ml.feature.Bucketizer` is left-closed (wrong closure), hence the
    * `when` chain.
    */
  def customers(df: DataFrame): DataFrame =
    df.na.fill(Map("email" -> "unknown@na.com"))
      .withColumn("churn_label", cutBin(col("churn_risk")))
      .withColumn("tenure_yrs", round(col("tenure_days") / 365, 1))

  def cutBin(c: Column): Column =
    when(c > 0 && c <= 0.3, "Low")
      .when(c > 0.3 && c <= 0.6, "Medium")
      .when(c > 0.6 && c <= 1.0, "High")
      .otherwise(lit(null).cast("string"))

  /** Finance transform (reference: etl_pipeline.py:210-215). */
  def finance(df: DataFrame): DataFrame =
    df.withColumn("net_flow", col("credit") - col("debit"))
      .withColumn("txn_date", toDateOrNull(col("txn_date")))
      .withColumn("is_deficit", col("net_flow") < 0)

  /** Dispatch map with identity passthrough for unmapped sources
    * (reference: etl_pipeline.py:218-225).
    */
  val dispatch: Map[String, DataFrame => DataFrame] = Map(
    "sales" -> sales,
    "customers" -> customers,
    "finance" -> finance)

  def apply(name: String, df: DataFrame): DataFrame =
    dispatch.getOrElse(name, identity[DataFrame] _)(df)

  // ---- oracle-parity helpers (used across SparkEntry queries) ----

  /** Order-independent exact sum of a monetary double column: cast to
    * DECIMAL first so the aggregation is exact integer arithmetic, then cast
    * the result back to double. This makes Spark and DuckDB agree bit-for-bit
    * regardless of aggregation order — plain double sums differ in the last
    * ulps between engines/partitionings.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean via exact decimal sum / count. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For each left row, attach the latest right row with the same key whose
  * time is <= the left time. Implemented with the union-and-sort technique
  * rather than an inequality join: tag both sides, union them, and for each
  * left row pick up the running "last seen right row" via a window over
  * (key, time). This is a single shuffle on the key — O((n+m) log p) — where
  * a naive `left.join(right, key && rTime <= lTime)` + argmax explodes to
  * O(n*m) rows per key before reducing. At 100 TB the union approach is the
  * only viable shape; it is also skew-tolerant under AQE since the exchange
  * is a plain hash partition on the key.
  */
object AsOfJoin {

  /** @param left       probe side (events)
    * @param right      reference side (state as of a time)
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  effective-time column on `right`
    * @param rightVals  right columns to carry (last value as-of wins; ties on
    *                   rightTime resolved by the LAST of `rightTiebreak`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      rightTiebreak: String): DataFrame = {
    val t = "__asof_t"
    val side = "__asof_side" // right=0 sorts before left=1 at equal times
    val tb = "__asof_tb"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(tb, lit(null).cast("long"))
    val lPadded = rightVals.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val rBase = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(0))
      .withColumn(tb, col(rightTiebreak).cast("long"))
    val rPadded = left.columns.foldLeft(rBase)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = (left.columns ++ rightVals ++ Seq(t, side, tb)).distinct.map(col)
    val unioned = lPadded.select(cols: _*).unionByName(rPadded.select(cols: _*))

    val w = Window
      .partitionBy(key)
      .orderBy(col(t), col(side), col(tb))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightVals.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    filled.filter(col(side) === 1).drop(t, side, tb)
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with the
    * same key whose time is >= the left time (the "next state change"
    * lookup — scheduling, next-shipment, SLA queries). Mirror of [[asOf]]:
    * same single-shuffle union-and-sort shape, but left rows sort BEFORE
    * right rows at equal times (inclusive >=) and each left row picks the
    * first right value in the FORWARD window frame; ties on rightTime
    * resolve to the LOWEST `rightTiebreak`.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      rightTiebreak: String): DataFrame = {
    val t = "__asof_t"
    val side = "__asof_side" // left=0 sorts before right=1 at equal times
    val tb = "__asof_tb"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(0))
      .withColumn(tb, lit(null).cast("long"))
    val lPadded = rightVals.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val rBase = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(1))
      .withColumn(tb, col(rightTiebreak).cast("long"))
    val rPadded = left.columns.foldLeft(rBase)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = (left.columns ++ rightVals ++ Seq(t, side, tb)).distinct.map(col)
    val unioned = lPadded.select(cols: _*).unionByName(rPadded.select(cols: _*))

    val w = Window
      .partitionBy(key)
      .orderBy(col(t), col(side), col(tb))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = rightVals.foldLeft(unioned)((d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))

    filled.filter(col(side) === 0).drop(t, side, tb)
  }
}

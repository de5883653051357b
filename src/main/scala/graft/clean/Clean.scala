package graft.clean

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Common cleaning stage applied to every source
  * (reference: etl_pipeline.py:181-189).
  *
  * Semantics preserved exactly:
  *  - full-row deduplication, keep-one (`drop_duplicates`, :185);
  *  - drop any row with a null in any column EXCEPT `email` (:186);
  *  - row-drop accounting for the health metrics (:184,187-188).
  *
  * Scale notes: `dropDuplicates()` over all columns is a hash shuffle on the
  * full row — at 100 TB this is the dominant cost of the stage, so the
  * in/out row counts are collected with `Dataset.observe` (accumulator-based,
  * zero extra scans) instead of separate `count()` actions, which would each
  * rescan the source. Counts become available after the caller's write/action.
  */
object Clean {

  final case class Cleaned(df: DataFrame, in: Observation, out: Observation)

  /** Columns exempt from the null-row drop (reference drops null rows on
    * every column but `email`, etl_pipeline.py:186).
    */
  val NullExempt: Set[String] = Set("email")

  def cleanCommon(df: DataFrame, obsPrefix: String = "clean"): Cleaned = {
    val in = Observation(s"${obsPrefix}_in")
    val out = Observation(s"${obsPrefix}_out")
    val subset = df.columns.filterNot(NullExempt.contains)
    val cleaned = df
      .observe(in, count(lit(1)).as("n"))
      .dropDuplicates()
      .na.drop("any", subset)
      .observe(out, count(lit(1)).as("n"))
    Cleaned(cleaned, in, out)
  }

  /** Counts from the observations after an action has run. */
  def counts(c: Cleaned): (Long, Long) =
    (c.in.get("n").asInstanceOf[Long], c.out.get("n").asInstanceOf[Long])
}

package graft.ext

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed training of a document-quality classifier WITHOUT MLlib:
  * logistic regression by a fixed number of full-batch gradient-descent
  * rounds, driver-orchestrated in the engine's iterative-loop convention
  * (each round = ONE aggregate over the feature frame; only 4 gradient
  * scalars ever reach the driver — the same shape as PageRank's rounds or
  * Lloyd's iterations, so it runs unchanged on a 1000-executor corpus).
  *
  * Engine-exactness (the interesting part): gradients are summed in
  * integer MICRO-UNITS. Per row, the residual g = y − σ(w·x) and each
  * feature are rounded to 6 decimals and scaled to 64-bit integers; the
  * per-feature gradient is Σ gu·xu in DECIMAL(38,0) — an order-free
  * integer sum — and the weight update divides back to double with the
  * identical expression on both engines. The only transcendental is
  * exp() inside σ, immediately rounded at 1e-6, so a last-ulp libm
  * disagreement cannot reach the sums. The DuckDB oracle unrolls the
  * same three rounds as chained CTEs and reproduces the weights
  * bit-for-bit — a trained model as a hash-checked query result.
  *
  * Features (all in [0,1], pinned at 1e-6): token count saturation,
  * distinct-token ratio, average-word-length saturation — the
  * [[TextAnalysis.qualityExpr]] terms. Label: lang = 'en' (a stand-in
  * for "high-quality" labels a production pipeline would source from
  * human raters or a teacher model).
  */
object Classifier {

  val Scale: Long = 1000000L // 1e6: micro-unit fixed point

  /** Feature frame: integer micro-unit features x0..x3 (x0 = bias) and
    * the 0/1 label. Map-side only.
    */
  def features(t: Tables): DataFrame = {
    val toks = split(trim(col("text")), " +")
    val n = TextAnalysis.tokenCount(col("text")).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    val awl = (length(trim(col("text"))) - (size(toks) - 1)).cast("double") /
      size(toks)
    // the one genuinely label-predictive feature: English marker-word
    // rate (the lang-id markers), saturated at 10 per 100 tokens
    val mk = expr(
      """size(filter(split(trim(text), ' +'),
           t -> t in ('the', 'data', 'query')))""").cast("double")
    def micro(c: Column): Column = round(c * Scale, 0).cast("long")
    t.documents.select(
      col("doc_id"),
      lit(Scale).as("x0_u"),
      micro(least(n / 100.0, lit(1.0))).as("x1_u"),
      micro(nd / size(toks)).as("x2_u"),
      micro(least(awl / 10.0, lit(1.0))).as("x3_u"),
      micro(least(mk * 10.0 / size(toks), lit(1.0))).as("x4_u"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
  }

  /** One GD round: returns the updated weights. `eta` is the learning
    * rate; the gradient aggregate runs distributed, only 4 scalars and
    * the (loop-invariant) row count come back.
    */
  private def roundGd(weights: Seq[Double], feat: DataFrame, nRows: Long,
      eta: Double): Seq[Double] = {
    val z = sigmaZ(weights)
    // gu: residual in micro-units, pinned BEFORE the sums so a last-ulp
    // exp() disagreement cannot propagate
    val gu = (round(
      (col("y").cast("double") - lit(1.0) /
        (lit(1.0) + exp(-z))) * Scale, 0)).cast("long")
    val sums = feat
      .withColumn("gu", gu)
      .agg(
        sum((col("gu") * col("x0_u")).cast(DecimalType(38, 0))).as("s0"),
        sum((col("gu") * col("x1_u")).cast(DecimalType(38, 0))).as("s1"),
        sum((col("gu") * col("x2_u")).cast(DecimalType(38, 0))).as("s2"),
        sum((col("gu") * col("x3_u")).cast(DecimalType(38, 0))).as("s3"),
        sum((col("gu") * col("x4_u")).cast(DecimalType(38, 0))).as("s4"))
      .head()
    // denominator = n · Scale² as a double product — both engines compute
    // the identical IEEE expression
    val den = nRows.toDouble * Scale.toDouble * Scale.toDouble
    weights.zipWithIndex.map { case (w, j) =>
      w + eta * sums.getDecimal(j).doubleValue() / den
    }
  }

  /** z = w·x as a double expression over the micro-unit features; the
    * xu/1e6 reconstruction keeps the feature doubles bit-identical to
    * the oracle's.
    */
  private def sigmaZ(weights: Seq[Double]): Column =
    Seq("x0_u", "x1_u", "x2_u", "x3_u", "x4_u").zip(weights)
      .map { case (c, w) =>
        lit(w) * (col(c).cast("double") / lit(Scale.toDouble))
      }
      .reduce(_ + _)

  /** Train `rounds` full-batch GD rounds from w = 0 and emit one graded
    * row: weights plus in-sample accuracy at the 0.5 threshold (an
    * INTEGER count — pred = σ(z) ≥ 0.5 ⟺ z ≥ 0, so the cut never
    * touches the transcendental).
    */
  def qLrTrain(t: Tables, rounds: Int = 3, eta: Double = 6.0): DataFrame = {
    val feat = features(t).localCheckpoint()
    val n = feat.count()
    var w: Seq[Double] = Seq(0.0, 0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to rounds) w = roundGd(w, feat, n, eta)
    val z = sigmaZ(w)
    val out = feat
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when((z >= 0.0) === (col("y") === 1L), 1L).otherwise(0L))
          .as("n_correct"),
        sum("y").as("n_pos"))
      .select(
        col("n_docs"), col("n_pos"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs").cast("double"))
          .as("accuracy"),
        lit(w(0)).as("w0"), lit(w(1)).as("w1"),
        lit(w(2)).as("w2"), lit(w(3)).as("w3"), lit(w(4)).as("w4"))
      .localCheckpoint()
    graft.Engine.freeCheckpoint(feat)
    out
  }

  /** Reliability diagram for the trained model: predicted-probability
    * deciles vs observed positive rate — the calibration check that turns
    * a trained classifier into a usable corpus-filter threshold. The bin
    * key floors the micro-rounded σ, so bin membership is decided on the
    * pinned value, not the raw transcendental.
    */
  def qLrCalibration(t: Tables, rounds: Int = 3, eta: Double = 6.0): DataFrame = {
    val feat = features(t).localCheckpoint()
    val n = feat.count()
    var w: Seq[Double] = Seq(0.0, 0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to rounds) w = roundGd(w, feat, n, eta)
    val sigu = round(lit(Scale.toDouble) /
      (lit(1.0) + exp(-sigmaZ(w))), 0).cast("long")
    val out = feat
      .withColumn("su", sigu)
      .withColumn("bin", least(expr(s"su * 10 div $Scale"), lit(9L)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("y").as("n_pos"),
        sum("su").as("su_sum"))
      .select(
        col("bin"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("observed_rate"),
        (col("su_sum").cast("double") /
          (col("n_docs").cast("double") * Scale.toDouble))
          .as("mean_predicted"))
      .orderBy("bin")
      .localCheckpoint()
    graft.Engine.freeCheckpoint(feat)
    out
  }
}

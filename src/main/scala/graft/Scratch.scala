package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only experiment harness for optimization-round plan variants
  * (not registered, not part of the engine). Times named variants of a
  * hot shape so a rewrite decision is measured, not argued.
  *
  *   runMain graft.Scratch <experiment> [sfDir]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val exp = args.headOption.getOrElse("pct")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.tune(spark)
    val t = Tables(spark, sfDir)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        println(f"[scratch] $name run $i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    exp match {
      case "pct" =>
        val base = Engine.spread(t.lineitem
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice")))
        time("scan_only")(base.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n")))
        time("current")(base.groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5D)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.9D)").as("p90_price"),
            expr("percentile(l_extendedprice, 0.99D)").as("p99_price")))
        time("no_spread")(t.lineitem
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5D)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.9D)").as("p90_price"),
            expr("percentile(l_extendedprice, 0.99D)").as("p99_price")))
        // qty collapsed to (value, freq) — ~50 distinct values
        time("freq_qty")(base.groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5D)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.9D)").as("p90_price"),
            expr("percentile(l_extendedprice, 0.99D)").as("p99_price")))
        // one array percentile for the two price quantiles
        time("price_array")(base.groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5D)").as("median_qty"),
            expr("percentile(l_extendedprice, array(0.9D, 0.99D))").as("pp")))
      case "pct2" =>
        // pre-collapse to (group, value, freq) then percentile with frequency
        val base = Engine.spread(t.lineitem
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice")))
        time("freq_collapsed") {
          val q = base.groupBy(col("l_returnflag"), col("l_quantity"))
            .agg(count(lit(1)).as("f"))
            .groupBy("l_returnflag")
            .agg(expr("percentile(l_quantity, 0.5D, f)").as("median_qty"))
          val p = base.groupBy(col("l_returnflag"), col("l_extendedprice"))
            .agg(count(lit(1)).as("f"))
            .groupBy("l_returnflag")
            .agg(
              expr("percentile(l_extendedprice, 0.9D, f)").as("p90_price"),
              expr("percentile(l_extendedprice, 0.99D, f)").as("p99_price"))
          q.join(p, "l_returnflag")
        }
      case "mad" =>
        val slim = Engine.spread(t.lineitem
          .select(col("l_returnflag"), col("l_extendedprice")))
        time("mad_current") {
          val med = slim.groupBy("l_returnflag")
            .agg(expr("percentile(l_extendedprice, 0.5D)").as("med_price"))
          slim.join(broadcast(med), "l_returnflag")
            .withColumn("adev", abs(col("l_extendedprice") - col("med_price")))
            .groupBy("l_returnflag")
            .agg(first(col("med_price")).as("med_price"),
              expr("percentile(adev, 0.5D)").as("mad"),
              count(lit(1)).as("n"))
        }
      case other =>
        System.err.println(s"unknown experiment $other")
    }
    spark.stop()
  }
}

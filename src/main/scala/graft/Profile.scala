package graft

import org.apache.spark.sql.SparkSession

/** Cold/warm profiler for a single registered query: times N repeated
  * executions in one JVM (first = cold: Janino/JIT/footer costs; rest =
  * steady state) and optionally flips session confs between runs, so a
  * "slow" bench entry can be attributed to one-time compilation vs real
  * compute before any optimization work starts.
  *
  *   runMain graft.Profile <query> [sfDir] [conf=k:v,k:v]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val confs = args.drop(2).headOption.toSeq
      .flatMap(_.stripPrefix("conf=").split(",").toSeq)
      .map { kv => val Array(k, v) = kv.split(":", 2); k -> v }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

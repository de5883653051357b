package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness (diagnostic main, like [[Profile]] / [[Explain]]):
  * union-multiplies the sf0.1 documents/embeddings tables into a
  * `factor`× corpus with salted ids and runs the scale-critical paths —
  * the dedup funnel, FORCED-distributed connected components, SemDeDup
  * cell capping, and the IVF-PQ index/search/recall family — recording
  * per-stage wall seconds and row counts as JSON lines. The results and
  * their cap/cutoff analysis live in SCALE.md ("10× stress run").
  *
  * Replica design: replica 0 is the original; ODD replicas append a
  * replica-marker token (near-duplicates of the original — they survive
  * exact dedup and stress banding, verify, and the component loop); EVEN
  * replicas > 0 copy the text verbatim (exact duplicates — they stress
  * the md5 keep-one stage and prove the funnel's exact-before-near
  * ordering collapses them before any banding). Embeddings replicate
  * verbatim under salted ids, multiplying every IVF cell's population by
  * `factor` — exactly the pressure that trips `maxCell` sub-blocking.
  *
  * The inflation itself is scale-shaped: a broadcast crossJoin against a
  * `factor`-row frame (map-side fan-out, no shuffle until the write).
  */
object StressScale {
  /** Diagnostic-session builder shared by the stress mains. */
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.tune(spark)
    spark
  }

  /** Union-multiply sfDir's documents/embeddings into a `factor`× corpus
    * at outDir (replica design in the object doc). Shared with
    * [[StressStream]], which re-inflates only when the dir is absent.
    */
  private[graft] def inflate(
      spark: SparkSession, sfDir: String, factor: Int, outDir: String): Unit = {
    val reps = broadcast(
      spark.range(factor).select(col("id").as("rep")))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * maxDoc).as("doc_id"),
        when(col("rep") % 2 === 1,
          concat(col("text"), lit(" rep"), col("rep")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + when(col("rep") % 2 === 1,
          length(concat(lit(" rep"), col("rep")))).otherwise(lit(0L)))
          .as("n_chars"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    emb.crossJoin(reps)
      .select((col("vec_id") + col("rep") * maxVec).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_stress10x"
    val spark = session()
    // force the distributed-CC branch outright: at this corpus size the
    // near-dup node set can straddle the 32768 default cutoff, and the
    // point of the stress is the 100 TB code path, not the driver
    // union-find shortcut
    spark.conf.set("spark.graft.cc.localCutoff", "64")

    inflate(spark, sfDir, factor, outDir)

    val t = Tables(spark, outDir)
    val nDocs = t.documents.count()
    val nVecs = t.embeddings.count()
    println(s"""{"stress":"inflate","factor":$factor,"docs":$nDocs,"vecs":$nVecs}""")

    def timed(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = f
      // full final plan, not a count-optimized rewrite (see Bench)
      val n = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stress":"$name","sec":$sec%.2f,"rows":$n}""")
      df
    }

    timed("dedup_exact")(ext.Dedup.qDedupExact(t))
    val funnel = timed("dedup_pipeline")(ext.Dedup.qDedupPipeline(t))
    funnel.orderBy("source").collect().take(5)
      .foreach(r => println(s"  funnel: $r"))
    val clusters = timed("dedup_clusters_dist")(
      ext.Dedup.qDedupClusters(t, forceDistributed = true))
    val maxGroup = clusters.agg(max("n_members")).head().getLong(0)
    println(s"""{"stress":"cc_max_group","value":$maxGroup}""")
    timed("dedup_cost_model")(ext.Dedup.qDedupCostModel(t))
      .collect().foreach(r => println(s"  cost: $r"))
    val sem = timed("semdedup")(ext.Similarity.qSemDedup(t))
    val pruned = sem.filter(col("keep") === 0).count()
    println(s"""{"stress":"semdedup_pruned","value":$pruned}""")
    timed("knn_ivfpq")(ext.Similarity.qKnnIvfPq(t))
    timed("ivfpq_recall")(ext.Similarity.qIvfPqRecall(t))
      .collect().foreach(r => println(s"  recall: $r"))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-recall stress harness (diagnostic main, the recall leg of
  * [[StressScale]]): the plain 10× stress corpus makes near-dup recall
  * easy — replica pairs sit far above the 0.7 jaccard threshold, where
  * the 8×4 banding's miss bound (1-j⁴)⁸ is negligible. This harness
  * builds the corpus the banding finds HARD and measures what actually
  * survives:
  *
  *   - a DENSE THRESHOLD-ADJACENT BAND: replica r of every doc keeps the
  *     first (0.78 + 0.01·r) fraction of its words and pads back to
  *     length with unique junk tokens, planting true pairs whose 3-gram
  *     jaccard straddles 0.7 (kept fraction f gives roughly
  *     j ≈ f/(2-f) ∈ [0.64, 0.77] for r ∈ 1..9);
  *   - HOT BOILERPLATE: 30% of doc families append one shared 40-word
  *     string — document frequency ~0.3·corpus for its grams, flooding
  *     gram buckets and dragging every hot pair's jaccard toward the
  *     threshold from both sides.
  *
  * Ground truth is [[graft.ext.Dedup.jaccardGroundTruth]] — ppjoin
  * prefix filtering + exact verify, full recall BY CONSTRUCTION — so the
  * banded pipeline's recall is measured, not argued, at a scale where
  * brute-force n²/2 verification is unaffordable. Output: one JSON line
  * per jaccard band (true pairs, banded hits, recall) + stage timings.
  * Results and the q_dedup_minhash oracle decision live in SCALE.md.
  */
object StressAdversarial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_stress_adv"
    val spark = StressScale.session()

    val reps = broadcast(
      spark.range(factor).select(col("id").as("rep")))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val boiler = (0 until 40).map(i => s"zzboiler$i").mkString(" ")
    // replica body: rep 0 keeps the text; rep r >= 1 keeps the first
    // floor((0.78+0.01r)·L) words and pads back to L with per-(doc,rep)
    // junk tokens — all map-side higher-order functions, no shuffle
    val w = graft.ext.Dedup.words(col("text"))
    val keptN = greatest(lit(3),
      floor((lit(0.78) + lit(0.01) * col("rep")) * size(w)).cast("int"))
    val junk = transform(
      sequence(lit(1), greatest(lit(0), size(w) - keptN)),
      i => concat(lit("zzj"), col("doc_id"), lit("r"), col("rep"),
        lit("x"), i))
    val body = when(col("rep") === 0, col("text"))
      .otherwise(array_join(concat(slice(w, lit(1), keptN), junk), " "))
    val hot = pmod(col("doc_id"), lit(10)) < 3
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * maxDoc).as("doc_id"),
        when(hot, concat(body, lit(" " + boiler))).otherwise(body)
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // the similarity stages only read documents, but Tables is a full-dir
    // contract — link the embeddings through unchanged
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val t = Tables(spark, outDir)
    val nDocs = t.documents.count()
    println(s"""{"stress":"adv_inflate","factor":$factor,"docs":$nDocs}""")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"stress":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }

    val gt = timed("ground_truth") {
      val g = Engine.loopCheckpoint(graft.ext.Dedup.jaccardGroundTruth(t))
      g.count()
      g
    }
    val eng = timed("banded_minhash") {
      val e = Engine.loopCheckpoint(graft.ext.Dedup.qDedupMinhash(t))
      e.count()
      e
    }
    // recall per jaccard band, computed distributively (no driver sets):
    // every ground-truth pair left-joined against the banded survivors
    val bands = gt
      .join(eng.select(col("id1"), col("id2"), lit(1L).as("hit")),
        Seq("id1", "id2"), "left")
      .withColumn("band",
        when(col("jaccard") < 0.75, "0.70-0.75")
          .when(col("jaccard") < 0.80, "0.75-0.80")
          .when(col("jaccard") < 0.90, "0.80-0.90")
          .otherwise("0.90+"))
      .groupBy("band")
      .agg(count(lit(1)).as("true_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("found"))
      .withColumn("recall",
        round(col("found").cast("double") / col("true_pairs"), 4))
      .orderBy("band")
    bands.collect().foreach { r =>
      println(s"""{"stress":"recall_band","band":"${r.getString(0)}",""" +
        s""""true_pairs":${r.getLong(1)},"found":${r.getLong(2)},""" +
        s""""recall":${r.getDouble(3)}}""")
    }
    // sanity both directions: the banded pipeline's verify is exact, so
    // every banded pair must exist in the ground truth (precision 1.0)
    val extra = eng.join(gt.select("id1", "id2"), Seq("id1", "id2"),
      "left_anti").count()
    println(s"""{"stress":"banded_pairs_outside_ground_truth","value":$extra}""")
    graft.Engine.freeCheckpoint(gt)
    graft.Engine.freeCheckpoint(eng)
    spark.stop()
  }
}

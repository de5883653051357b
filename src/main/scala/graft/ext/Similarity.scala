package graft.ext

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set and
  * stream the corpus once; per-pair cosine is a codegen'd higher-order
  * zip/aggregate fold, no UDFs. Scale path: IVF — partition the corpus into
  * coarse cells (here the provided `label`, in general k-means centroids),
  * assign each query to its nearest cell(s), and search only those buckets;
  * the probe joins on the cell key so the corpus-side scan prunes.
  *
  * Numeric note: floats are cast to double BEFORE any arithmetic, and the
  * fold runs left-to-right in array order — deterministic IEEE sequence, so
  * an engine replaying the same order (DuckDB list_sum over the same
  * transform) produces bit-identical cosines.
  */
object Similarity {

  /** Elementwise dot product of two double arrays (sequential fold) —
    * reference formulation via higher-order functions; kept for parity
    * tests against the native expression.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** HOF cosine (interpreted lambdas; parity baseline). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine ([[graft.functions.CosineSim]]) — same
    * sequential accumulation order, so bit-identical to cosineHof and to
    * the DuckDB oracle; ~10x faster on the 25M-pair kNN stage.
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: queries = every 200th vector. Broadcast the
    * query side (it is the small one), scan the corpus once, rank per query.
    */
  def qKnnBrute(t: Tables, k: Int = 5): DataFrame = {
    val corpus = t.embeddings
      .select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nvec"))
    val queries = t.embeddings
      .filter(pmod(col("vec_id"), lit(200)) === 0)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qvec"))
    // ranking via the bounded top-k aggregate: the 25M-similarity stream is
    // reduced to k rows per (query, map task) BEFORE the shuffle — a
    // ranking window here would exchange every similarity row
    corpus
      .crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
      .groupBy("qid")
      .agg(call_function("bounded_topk",
        struct(col("sim"), col("nid")), lit(k), lit(true)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "item")))
      .select(
        col("qid"),
        col("item.id").as("nid"),
        col("item.score").as("sim"),
        (col("i") + 1).cast("long").as("rnk"))
      .orderBy("qid", "rnk")
  }

  /** IVF-style pruned search: coarse cells = `label`; centroid per cell via
    * elementwise mean (posexplode + re-collect); each query probes only its
    * nearest cell. Output: per query, top-k within the probed cell.
    * Approximate by construction — verified as rows-only by the harness and
    * against recall in unit tests.
    */
  def qKnnIvf(t: Tables, k: Int = 5): DataFrame = {
    val emb = t.embeddings.select(
      col("vec_id"), col("label"), asDouble(col("embedding")).as("vec"))

    // centroids: mean per (label, dim) then re-assembled in dim order
    val centroids = emb
      .select(col("label"), posexplode(col("vec")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(avg("v").as("mv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("packed"))
      .select(col("label").as("c_label"),
        transform(col("packed"), s => s.getField("mv")).as("cvec"))

    val queries = emb
      .filter(pmod(col("vec_id"), lit(200)) === 0)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))

    // assign each query to its nearest centroid (broadcast both small sides)
    val wAssign = Window.partitionBy("qid").orderBy(col("csim").desc, col("c_label"))
    val assigned = queries
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("qid"), col("qvec"), col("c_label"))

    // probe only the assigned cell: equi-join on label prunes the corpus
    val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    emb
      .withColumnRenamed("vec_id", "nid")
      .join(broadcast(assigned), col("label") === assigned("c_label"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rnk"))
      .orderBy("qid", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs, blocked by the coarse cell key
    * (label): the all-pairs comparison happens only within a cell, which is
    * the same pruning IVF uses — at scale the blocking key comes from
    * k-means cells or LSH buckets instead of an exhaustive cross join.
    */
  def qDedupEmbed(t: Tables, threshold: Double = 0.8): DataFrame = {
    val emb = t.embeddings.select(
      col("label"), col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = emb.select(col("label"), col("vec_id").as("id1"), col("v").as("v1"))
    val b = emb.select(col("label"), col("vec_id").as("id2"), col("v").as("v2"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("sim", cosine(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
      .orderBy("id1", "id2")
  }

  /** Per-row vector diagnostics on a deterministic sample: L2 norm computed
    * by the same sequential fold as the oracle's list arithmetic — raw
    * doubles, no aggregation, so the compare is bit-exact.
    */
  def qVectorNorms(t: Tables): DataFrame =
    t.embeddings
      .filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(
        col("vec_id"),
        norm(asDouble(col("embedding"))).as("l2"),
        size(col("embedding")).cast("long").as("dim"))
      .orderBy("vec_id")

  /** LSH-bucketed cosine search: random-hyperplane signatures (sign bits of
    * projections onto deterministic pseudo-random planes) — documents the
    * third scale path. Hyperplanes are derived from xxhash64(dim, plane) so
    * the whole thing is reproducible with no driver-side state.
    */
  def qKnnLsh(t: Tables, planes: Int = 12): DataFrame = {
    val emb = t.embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    // signature bit p = sign(sum_d vec[d] * h(d, p)), h in {-1, +1}
    // fold acc*2 + bit so the signature packs without a variable shift
    val sig = emb.withColumn(
      "sig",
      aggregate(
        sequence(lit(0), lit(planes - 1)),
        lit(0L),
        (acc, p) =>
          acc * 2 + when(
            aggregate(
              zip_with(
                col("vec"),
                sequence(lit(0), size(col("vec")) - 1),
                (v, d) => v * (pmod(xxhash64(d, p), lit(2)).cast("double") * 2.0 - 1.0)),
              lit(0.0),
              (a, x) => a + x) > 0,
            lit(1L)).otherwise(lit(0L))))
    sig
      .groupBy("sig")
      .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"))
      .orderBy("sig")
  }
}

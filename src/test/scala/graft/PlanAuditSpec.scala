package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the scale-critical properties PLANS.md
  * documents, enforced. If an optimizer change or refactor reintroduces a
  * fact-table shuffle, drops a pushdown, or de-broadcasts a dimension,
  * these fail before any benchmark notices.
  */
class PlanAuditSpec extends SparkSuite {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Full-tree audit for queries whose shared intermediates loopCheckpoint
    * (round-10 advice): with checkpoints live, the heavy subtree appears
    * as `Scan ExistingRDD` and scale assertions pass vacuously — and
    * constructing the query in a test eagerly executes the build.
    * `noCheckpoint` makes checkpoints pass-throughs (no execution, full
    * operator tree). Data caches are reset before (so a frame another
    * suite already materialized doesn't truncate the tree) and after (so
    * an UNMATERIALIZED frame stored by a cache built under noCheckpoint
    * never leaks into later suites' real executions).
    */
  private def fullPlan(name: String): String = {
    Engine.resetDataCaches()
    spark.conf.set("spark.graft.explain.noCheckpoint", "true")
    try formatted(name)
    finally {
      spark.conf.unset("spark.graft.explain.noCheckpoint")
      Engine.resetDataCaches()
    }
  }

  private def shuffleCount(plan: String): Int =
    "(?<![A-Za-z])Exchange ".r.findAllIn(
      plan.linesIterator.filterNot(_.contains("BroadcastExchange")).mkString("\n")
    ).length

  test("q1_agg pushes the date filter into the scan and prunes columns") {
    val p = formatted("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // 6 of 11 lineitem columns read
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length <= 6, s"ReadSchema too wide: $read")
  }

  test("star join broadcasts every dimension side, no sort-merge join") {
    val p = formatted("q_join_region_revenue")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4)
  }

  test("bounded top-k aggregates partially before its exchange") {
    val p = formatted("q_window_topk")
    assert(p.contains("partial_bounded_topk") || p.contains("partial_boundedtopk"),
      "no map-side partial for bounded_topk")
  }

  test("LSH knn never shuffles the corpus: bounded shuffle-exchange count") {
    // allowed exchanges: candidate dedup, final top-k agg, output sort —
    // anything more means corpus rows started moving
    val p = formatted("q_knn_lsh")
    val n = shuffleCount(p)
    assert(n <= 3, s"expected <=3 shuffle exchanges, got $n:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3)
  }

  test("portable LSH knn keeps the banded shape: corpus never shuffles") {
    // same budget as q_knn_lsh: candidate dedup, top-k agg, output sort —
    // the md5/micro-unit signature must not change the exchange structure
    val p = formatted("q_knn_lsh_portable")
    val n = shuffleCount(p)
    assert(n <= 3, s"expected <=3 shuffle exchanges, got $n:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3)
  }

  test("portable simhash verify fetches fingerprints via broadcast joins") {
    // band/bucket grouping + pair dedup + final sort are the only
    // shuffles ON TOP OF the fingerprint aggregate; the verify joins on
    // candidate ids must broadcast (candidate set is bucket-cap bounded)
    val p = graft.ext.Dedup
      .simhashPortablePairs(tables.documents, "doc_id", "text",
        maxHamming = 3, maxBucket = 100, checkpoint = false)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the candidate-id semi-join carries an explicit broadcast hint; the
    // two fingerprint fetch joins are left to AQE (verifyJaccard's
    // pattern) — statically they must at least not plan a cartesian
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      "candidate id set not broadcast")
    assert(!p.contains("CartesianProduct"), "verify join went cartesian")
    // the fingerprint is the native per-row expression — a map-side
    // projection, so the word stream never explodes into an aggregate
    assert(p.toLowerCase.contains("portablesimhash"),
      "fingerprint not the native per-row expression")
  }

  test("native as-of join plans the custom exec between sorted exchanges") {
    val p = formatted("q_asof_join_native")
    assert(p.contains("AsOfJoinExec") || p.contains("AsOfJoin"))
  }

  test("contamination broadcasts the benchmark gram set into the corpus join") {
    // the corpus-side gram stream must meet the benchmark set in a
    // BroadcastHashJoin: a sort-merge fallback would shuffle the whole
    // corpus's grams on the string key
    val p = formatted("q_contamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark set not broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus gram stream fell into SMJ")
  }

  test("IVF probe meets the corpus through a broadcast join on the cell key") {
    // corpus rows compute their cell id as a projection; the assigned query
    // set broadcasts — the corpus itself must never hash-shuffle for the
    // probe (only the per-query rank/sort exchanges remain)
    val p = formatted("q_knn_ivf")
    assert(p.contains("BroadcastHashJoin"), "query assignments not broadcast")
    assert(!p.contains("SortMergeJoin"), "probe join fell into SMJ")
  }

  test("label centroids aggregate vectors partially before the exchange") {
    // the whole point of vector_sum: one partially-aggregated row per label
    // crosses the shuffle, never the exploded (row x dim) stream
    val p = formatted("q_label_centroids")
    assert(p.contains("partial_vectorsum") || p.contains("partial_vector_sum"),
      "no map-side partial for vector_sum")
    // one legitimate posexplode exists — over the AGGREGATE OUTPUT `s`
    // (k x dim rows). Any other posexplode means the input stream was
    // exploded before aggregation, the exact shape vector_sum replaces.
    // (formatted mode prints the generator on an Arguments detail line,
    // never adjacent to the word "Generate" — match the argument itself.)
    val explodes = "posexplode\\(".r.findAllIn(p).size
    val overAggOutput = "posexplode\\(s#".r.findAllIn(p).size
    assert(explodes == overAggOutput && explodes >= 1,
      s"centroid input exploded before aggregation " +
        s"($explodes posexplode(s), $overAggOutput over the aggregate output)")
  }

  test("supplier top-k aggregates partially before the per-nation exchange") {
    // k rows per map task cross the shuffle, not every supplier through a
    // ranking window
    val p = formatted("q_topk_suppliers")
    assert(p.contains("partial_boundedtopk") || p.contains("partial_bounded_topk"),
      "no map-side partial for bounded_topk")
    assert(!p.contains("RunningWindowFunction") && !p.contains("row_number"),
      "top-k fell back to a ranking window")
  }

  test("bloom prefilter probes a scalar-subquery bloom before the semi join") {
    val p = formatted("q_bloom_prefilter")
    assert(p.contains("might_contain"), "bloom probe missing from the plan")
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      "bloom not built as a scalar subquery")
  }

  test("heavy hitters: CMS scalar subquery probe, candidates broadcast into events") {
    val p = formatted("q_heavy_hitters")
    // explain prints the expression class name: cmsestimate. Catalyst even
    // infers the probe predicate onto the EVENTS scan via the join key
    // (both sides CMS-prefiltered map-side) — assert it survives on both.
    assert("cmsestimate".r.findAllIn(p).length >= 2,
      "CMS probe missing from the plan (expected on both join sides)")
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      "sketch not built as a scalar subquery")
    // the candidate set joins events as the broadcast side — the exact
    // verify never shuffles raw events by key before candidate filtering
    assert(p.contains("BroadcastHashJoin"), "candidate join must broadcast")
    assert(!p.contains("SortMergeJoin"), "candidate join fell back to SMJ")
  }

  test("full outer join co-partitions both aggregated sides (no broadcast attempt)") {
    val p = formatted("q_full_outer")
    assert(p.contains("FullOuter"), "join type lost")
    // both sides are pre-aggregated before the join: the merge sees
    // (hour,bucket) aggregates, not raw events
    assert("partial_count".r.findAllIn(p).length >= 2,
      "sides must aggregate map-side before the join exchange")
  }

  test("z-score outliers broadcast the moment frame, one fact-side shuffle tier") {
    val p = formatted("q_zscore_outliers")
    // the 5-row moment frame joins back by broadcast — the fact side must
    // not re-shuffle on segment for that join (its only exchanges are the
    // custkey join tier, the moment aggregate, the window, and the sort)
    assert(p.contains("BroadcastHashJoin"), "moments not broadcast")
    assert(shuffleCount(p) <= 5, s"fact side re-shuffled:\n$p")
  }

  test("decile lift sorts only the per-customer aggregate") {
    val p = formatted("q_decile_lift")
    // ntile needs a single-partition sort; it must run over the
    // per-customer AGGREGATE (sort key = spend), never raw orders (whose
    // sort key would be o_totalprice)
    assert(p.contains("Arguments: SinglePartition"),
      s"expected the ntile single-partition exchange:\n$p")
    val sortArgs = "\\(\\d+\\) Sort[^\n]*\nInput[^\n]*\nArguments: \\[([^\n]*)"
      .r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(sortArgs.exists(_.contains("spend")),
      s"global sort must run on the aggregated spend column:\n$p")
    assert(!sortArgs.exists(_.contains("o_totalprice")),
      s"raw orders must never be globally sorted:\n$p")
  }

  test("jaro names: blocked equi-join, no cartesian, codegen'd similarity") {
    val p = formatted("q_jaro_names")
    assert(!p.contains("CartesianProduct"), "pair generation went cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "pair generation went NL")
    assert(p.contains("jaro_winkler") || p.contains("jarowinkler"),
      "similarity expression missing from the plan")
  }

  test("tpch q6 pushes every predicate into the parquet scan") {
    val p = formatted("q_sql_q6")
    assert(p.contains("PushedFilters:"))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(("PushedFilters:[^\n]*" + c).r.findFirstIn(p).isDefined,
        s"$c not pushed to the scan:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length <= 4, s"ReadSchema too wide: $read")
  }

  test("bigram surprisal aggregates to vocab frames: no sorts, no cache scan") {
    val p = fullPlan("q_bigram_surprisal")
    assert(!p.contains("InMemoryTableScan"), "rewrite should not persist")
    // the vocab-join shape replaced the windowed one: the corpus LM must
    // come from hash aggregates (windows would show Sort + Window nodes
    // over the full gram stream — the 9.9s plan this replaced)
    assert(!p.contains("Window"), s"LM must not be computed by windows:\n$p")
    // exchanges: 2x spread + gram->vocab agg + vocab->firsts agg + sampled
    // doc-gram agg + the shuffle_hash LM join keys (both sides of both
    // joins — pinned to hash joins so AQE can't flip them to sort-merge)
    // + final doc agg + output sort; all but the gram->vocab partial-agg
    // exchange move vocab- or sample-sized frames
    assert(shuffleCount(p) <= 12, s"too many exchanges:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      "LM joins must be pinned hash joins, not sort-merge")
    assert("partial_count".r.findAllIn(p).nonEmpty,
      "gram stream must combine map-side before its exchange")
  }

  test("tpch q19: disjunctive predicate keeps the equi-join; prefilters pushed") {
    val p = formatted("q_sql_q19")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "OR-of-ANDs must not defeat the equi-join")
    // the per-table brand/size prefilter reaches the part scan
    assert(p.contains("In(p_brand") || p.contains("Or(And("),
      s"no pushed prefilter on part:\n$p")
  }

  test("anomaly IQR broadcasts the fence frame; fact side never sorts globally") {
    val p = fullPlan("q_anomaly_iqr")
    assert(p.contains("BroadcastHashJoin"), "fences must broadcast back")
    // global sort allowed only for the 5-row presentation ORDER BY: every
    // Sort node must sit above the final aggregate, not on the fact stream
    assert(!p.contains("SortMergeJoin"), "fact joined by sort-merge")
  }

  test("centroid similarity: corpus collapses via partial vector_sum; pair join is label-sized") {
    val p = formatted("q_centroid_sim")
    assert(p.contains("partial_vector_sum") || p.contains("partial_vectorsum"),
      "corpus must combine map-side into label sums")
    assert(!p.contains("CartesianProduct"), "pair stage must be an equi-join on dim")
  }

  test("incremental aggregate merge stays two partial rollups + one merge agg") {
    val p = formatted("q_incr_agg")
    // both branches aggregate partially before their exchange, and the
    // merge is itself an aggregate — never a join
    assert("partial_count".r.findAllIn(p).size >= 2, s"branches must pre-aggregate:\n$p")
    assert(!p.contains("Join"), "merge must be union+agg, not a join")
  }

  test("ship streaks windows run on the distinct (supplier, day) frame") {
    val p = formatted("q_ship_streaks")
    // the dedup aggregate must sit BELOW the window sort: partial_first or
    // HashAggregate before any Window node
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(winIdx > 0 && aggIdx > 0 && aggIdx < winIdx,
      "window must consume the compacted frame, not raw lineitem")
  }

  test("item cf ships k rows per map task through partial bounded_topk") {
    val p = formatted("q_item_cf")
    assert(p.contains("partial_bounded_topk") || p.contains("partial_boundedtopk"),
      "per-item ranking must pre-aggregate before its exchange")
    assert(!p.contains("Window"), "ranking must not window the full pair set")
  }

  test("incremental dedup broadcasts the arriving batch into the corpus stream") {
    val p = formatted("q_dedup_incremental")
    assert(p.contains("BroadcastExchange"), "batch side must broadcast")
    // corpus side work: map-side explode into the broadcast join, then ONE
    // pair aggregation exchange + the presentation sort — nothing else
    assert(shuffleCount(p) <= 2, s"corpus must not shuffle before the pair agg:\n$p")
  }

  test("dup spans: grams cross exchanges as 60-bit hashes, never raw text") {
    // round 10: the span-range fact sits behind a session cache shared by
    // three graded queries, so the registered q_dup_spans plan reads the
    // materialized frame — audit the BUILD pipeline, where the gram
    // exchanges actually live
    val p = graft.ext.TextAnalysis
      .dupSpanRangesBuild(Tables(spark, sfDir), 8)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // exchanges: Engine.spread's repartition (small-file fan-out), gram
    // frequency agg, join-back of shared grams, per-doc windows/aggs —
    // the exchange count stays bounded
    assert(shuffleCount(p) <= 7, s"unexpected exchange growth:\n$p")
    assert(p.contains("wordshingles") || p.contains("word_shingles"),
      "grams must come from the native expression")
    // every gram-keyed exchange partitions on the md5-conv hash (8-byte
    // long), never the raw n-word string — ~5-10× fewer shuffle bytes
    assert("hashpartitioning\\(gh#\\d+L".r.findAllIn(p).nonEmpty,
      s"gram hash key missing from exchanges:\n$p")
    assert("hashpartitioning\\(g#\\d+[,)]".r.findAllIn(p).isEmpty,
      s"raw gram string crosses an exchange:\n$p")
  }

  test("topic scores meet the dictionary through broadcast joins only") {
    // the corpus tf stream must never shuffle on the word key to reach
    // the (dimension-sized) topic dictionary — a sort-merge fallback
    // would reshuffle every (doc, word) pair
    val p = fullPlan("q_topic_scores")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "dictionary/hot-word guards not broadcast")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled to meet a dim:\n$p")
  }

  test("bm25 broadcasts query-term stats; corpus contributes scan passes only") {
    // the term filter runs post-explode (a posting probe at index time),
    // so the scale claims are: df/stats meet tf through broadcasts and
    // nothing falls back to a corpus-wide sort-merge join
    val p = fullPlan("q_bm25_search")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      "df dimension not broadcast")
    assert(!p.contains("SortMergeJoin"), s"query-term join fell back to SMJ:\n$p")
  }

  test("morton clustering key plans as the native expression, zmax broadcasts") {
    val p = formatted("q_zorder_layout")
    // the native (codegen'd) expression must appear in the Project — a
    // lambda/UDF fallback would name differently — and the bucket
    // arithmetic is map-side against one broadcast scalar
    assert(p.toLowerCase.contains("morton"), s"native morton missing:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "zmax scalar should broadcast, not shuffle")
  }

  test("power iteration rounds re-read the tall frame; iterate joins broadcast") {
    val p = formatted("q_power_iteration")
    assert(p.contains("BroadcastHashJoin"),
      "the dimension-sized iterate must broadcast into round 2")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian in matvec")
  }

  test("interval overlap meets incidents through a broadcast on the hour key") {
    // the session side explodes to covered hours and must probe the tiny
    // incident dimension in a BroadcastHashJoin — an SMJ here means the
    // exploded session-hour stream shuffled on the hour key
    val p = formatted("q_interval_overlap")
    assert(p.contains("BroadcastHashJoin"), s"incidents not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("mahalanobis: moment frame broadcasts, fact side stays map-side until top-k") {
    val p = formatted("q_mahalanobis")
    // one-row moment frame joins the fact via broadcast-nested-loop (no
    // key), then distance + TakeOrderedAndProject — no fact-wide sort
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"moments should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded take, not a global sort:\n$p")
  }

  test("mann-whitney/ks reduce to the distinct-value domain before any window") {
    // the corpus must collapse through a partial hash aggregate before
    // any window touches it. q_mannwhitney's domain is bounded (50
    // l_quantity values) so it keeps the single-partition domain window
    // (<=3 exchanges); q_ks_test's domain scales with order volume, so
    // round 11 moved its ECDF to the two-pass prefix — the extra
    // exchanges are all DOMAIN-sized (range partition, per-partition
    // totals, offset fold), never the fact, and no unpartitioned window
    // over the domain remains
    for ((name, bound) <- Seq("q_mannwhitney" -> 3, "q_ks_test" -> 8)) {
      val p = formatted(name)
      assert(p.contains("HashAggregate"), s"$name: no hash aggregate:\n$p")
      val n = shuffleCount(p)
      assert(n <= bound, s"$name: expected <=$bound shuffle exchanges, got $n")
    }
    val ks = formatted("q_ks_test")
    assert(!"windowspecdefinition\\(v#".r.findFirstIn(ks).isDefined,
      s"ks ECDF still windows over the raw value domain:\n$ks")
  }

  test("token budget: two-pass cumsum — no event-volume window, no global sort in the final plan") {
    // the greedy cumsum runs as range-partition + per-partition offsets
    // (qAssignIds' shape); the final plan over the cumsum RDD must carry
    // NO window at all (the old single-partition Window.orderBy shape) and
    // only the rollup + presentation exchanges
    val p = formatted("q_token_budget")
    assert(!p.contains("Window"), s"cumsum regressed to a window:\n$p")
    assert(shuffleCount(p) <= 3, s"too many exchanges:\n$p")
  }

  test("session concurrency: sweep windows are hour-partitioned; carry frame broadcasts") {
    val p = formatted("q_session_concurrency")
    // two windows appear: the in-hour sweep (partitioned) and the
    // hour-total carry chain (over the dimension-sized hour frame); the
    // event-volume window MUST be partitioned — assert via the physical
    // partitioning clause
    assert(p.contains("Window"), s"sweep lost its window formulation:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"hour carry frame should broadcast:\n$p")
  }

  test("naive bayes: likelihood table broadcasts into the tf stream") {
    // the vocab x lang table and the priors are dimension-sized; the
    // per-doc term-frequency stream must meet them through broadcasts,
    // never by shuffling the corpus on the word key
    val p = formatted("q_nb_confusion")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      s"likelihood table not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("decision stump: features collapse to their value domain before windows") {
    val p = formatted("q_decision_stump")
    assert(p.contains("HashAggregate"), s"no domain collapse:\n$p")
    // one union-wide domain aggregate + per-feature windows + final
    // argmax: the fact table crosses at most these exchanges
    assert(shuffleCount(p) <= 4, s"too many exchanges:\n$p")
  }

  test("basket pairs probe the session co-purchase index, no self-join") {
    // the pair fact arrives as checkpointed rows (Scan ExistingRDD); any
    // join in this plan means the basket self-join crept back in
    val p = formatted("q_basket_pairs")
    assert(!p.contains("Join"), s"basket self-join re-appeared:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan"),
      s"pair fact not a materialized scan:\n$p")
  }

  test("hapax ratio aggregates partially before its word exchange") {
    // the (source, word) count must map-side combine — the word stream
    // crosses its exchange as partials, never as raw tokens
    val p = formatted("q_hapax_ratio")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"no map-side combine on the word aggregate:\n$p")
    // spread repartition + word exchange + source exchange + output sort
    assert(shuffleCount(p) <= 4, s"too many exchanges:\n$p")
  }

  test("link prediction: per-probe ranking window, no global sort of candidates") {
    val p = formatted("q_link_prediction")
    // the row_number window partitions by the probe — a global
    // single-partition window here would serialize the candidate stream
    assert(!p.contains("No Partition Defined"),
      s"candidate ranking lost its probe partitioning:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("silhouette: centroid frame broadcasts, corpus never self-joins") {
    // points meet the label-count-sized centroid frame through ONE
    // broadcast nested loop; any hash/sort-merge join or cartesian here
    // means point rows started shuffling against each other
    val p = formatted("q_silhouette")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"centroids not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"non-broadcast cartesian:\n$p")
  }

  test("assortativity: degree joins broadcast; one moment aggregate") {
    val p = formatted("q_assortativity")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"degree frames not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"edge-side SMJ:\n$p")
  }

  test("clustering coefficient: per-node credit via hash aggregate, no cartesian") {
    val p = formatted("q_clustering_coeff")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // the wedge enumeration lives in the shared per-node triangle census
    // (triPerNodeCache — built once per dataset, reused by
    // q_triangle_count), so the query plan itself must be the cheap
    // epilogue: node-sized degree frame joined to the checkpointed census
    // (Scan ExistingRDD), never a parquet re-scan of the corpus
    assert(p.contains("ExistingRDD"), s"census not checkpoint-backed:\n$p")
    assert(!p.contains("Scan parquet"),
      s"epilogue re-scans parquet instead of probing shared frames:\n$p")
  }

  test("srm gate: one distinct-user exchange; grid math is dimension-sized") {
    val p = formatted("q_ab_srm")
    // distinct users + bucket aggregate + (k)-row epilogue: the bucket
    // explode must not introduce extra fact-sized exchanges
    assert(shuffleCount(p) <= 5, s"too many exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("trend tests materialize the month series once (checkpoint-backed result)") {
    // the monthly rollup is loopCheckpoint'ed before its 3-4 consumers
    // (pair scan sides, tie census, month count) — without it each
    // consumer re-runs orders⋈customer (measured: 16 parquet scans). The
    // graded frame must therefore be checkpoint-backed: zero parquet
    // scans in its final plan.
    for (q <- Seq("q_mann_kendall", "q_theil_sen")) {
      val p = formatted(q)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 0, s"$q: series not materialized once ($scans scans):\n$p")
    }
  }

  test("burstiness/dwell: user-partitioned windows, never single-partition") {
    for (q <- Seq("q_burstiness", "q_dwell_time")) {
      val p = formatted(q)
      assert(!p.contains("No Partition Defined"),
        s"$q: gap window collapsed to one partition:\n$p")
    }
  }

  test("hash split: map-side split + one aggregate; scan prunes to 4 cols") {
    // the split is a projection over the scan — no join, no window over
    // the fact; the only exchanges are the (split, source) aggregate,
    // the source-share window, and the output sort
    val p = formatted("q_hash_split")
    assert(shuffleCount(p) <= 3, s"too many exchanges:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(read.split(",").length <= 4, s"ReadSchema too wide: $read")
  }

  test("adamic adar: degree weights broadcast onto the probe wedge stream") {
    // probe adjacency × edge index on the middle node, then the
    // node-sized weight frame must arrive by broadcast — an SMJ there
    // would shuffle the wedge stream a second time
    val p = formatted("q_adamic_adar")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // epilogue probes the shared checkpointed edge index, no parquet re-scan
    assert(!p.contains("Scan parquet"),
      s"probe stage re-scans parquet instead of the shared index:\n$p")
  }

  test("rec eval/ndcg: probe the cached frames, no train-side rebuild") {
    // both consumers must read the session-cached recommendation/test
    // frames (Scan ExistingRDD) — a parquet scan in either plan means
    // the basket self-join is being rebuilt per query
    for (q <- Seq("q_rec_eval", "q_rec_ndcg")) {
      val p = formatted(q)
      assert(p.contains("ExistingRDD"), s"$q: frames not checkpoint-backed:\n$p")
      assert(!p.contains("Scan parquet"), s"$q: train-side rebuild:\n$p")
    }
  }

  test("levene: group-partitioned rank window; median frame broadcasts") {
    val p = formatted("q_levene")
    assert(!p.contains("No Partition Defined"),
      s"median rank window collapsed to one partition:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"median frame not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact-side SMJ:\n$p")
  }

  test("importance weights: bucket LM broadcasts into the doc stream") {
    // the 4096-row weight table must arrive by broadcast; an SMJ there
    // would sort the (doc, bucket) stream — corpus-sized — on the join key
    val p = formatted("q_importance_weights")
    assert(p.contains("BroadcastHashJoin"), s"weight table not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"doc-stream SMJ:\n$p")
  }

  test("paired t-test: one fact shuffle, no self-join") {
    // both eras come out of ONE conditional aggregation over orders — a
    // second Exchange would mean the query joined orders to itself
    // fact-key Exchange + the 1-row final-aggregate gather = 2; a third
    // would mean the eras were computed by joining orders to itself
    val p = formatted("q_paired_ttest")
    assert(shuffleCount(p) <= 2, s"paired eras should not self-join:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
  }

  test("permutation test: explode on the customer frame, not the fact") {
    // the nPerm-way sequence explode must sit ABOVE the customer-key
    // aggregate: exactly one fact-sized Exchange (custkey), then the
    // permutation stream aggregates by b
    val p = fullPlan("q_permutation_test")
    assert(p.contains("Generate") && p.contains("explode("),
      s"no explode in plan:\n$p")
    // count tree nodes only (formatted repeats each scan in the detail
    // section): once for the permutation stream, once for the observed gap
    val scans = "[:+]- Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"fact scanned more than twice:\n$p")
  }

  test("kneser-ney: probe contexts and type total broadcast") {
    val p = fullPlan("q_kneser_ney")
    assert(p.contains("BroadcastHashJoin"), s"probes not broadcast:\n$p")
    // the continuation-count join is vocab×vocab on the gram key: hash
    // join on the shuffled key, no sort of the bigram-type frame
    assert(!p.contains("SortMergeJoin"), s"vocab SMJ:\n$p")
  }

  test("tukey hsd: group frame materialized once, fact never re-scanned") {
    // the pair grid and the MSW scalar must read the checkpointed k-row
    // group frame — a parquet scan in the final plan means one of the
    // three consumers re-aggregated orders
    val p = formatted("q_tukey_hsd")
    assert(!p.contains("Scan parquet"), s"fact re-scanned:\n$p")
    assert(!p.contains("SortMergeJoin"), s"k-row pair grid SMJ:\n$p")
  }

  test("growth accounting grid: one scan, one ordered user window") {
    // the grid is the fact-sized stage (the rollups run over its k-day
    // checkpoint); lag/lead must come from a single (user, day-ordered)
    // window — a partition-min for first_day would add a Window + shuffle
    val p = graft.ops.Events.growthGrid(Tables(spark, sfDir))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("[:+]- Scan parquet".r.findAllIn(p).length <= 1,
      s"fact scanned more than once:\n$p")
    assert("\\(\\d+\\) Window".r.findAllIn(p).length <= 1,
      s"extra window spec:\n$p")
    assert(shuffleCount(p) <= 3, s"grid exchanges grew:\n$p")
  }

  test("IVF-PQ search: query tables broadcast onto codes, corpus codes never cartesian") {
    // the corpus side carries only (ivf_cell, subspace, code digit) into
    // the ADC join — per-query distance tables must broadcast, and the
    // only shuffles after encoding are the code argmin window, the
    // (qid,nid) ADC sum, the per-query top-k, and the output sort
    val p = graft.ext.Similarity.qKnnIvfPq(tables, checkpoint = false)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"query tables not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"ADC join went cartesian:\n$p")
    val n = shuffleCount(p)
    assert(n <= 5, s"expected <=5 shuffle exchanges, got $n:\n$p")
    assert(p.contains("partial_bounded_topk") || p.contains("partial_boundedtopk"),
      "no map-side partial for the per-query top-k")
  }

  test("semDedup serve: keeper index broadcast by default, conf-switched shuffled join, same verdicts") {
    import org.apache.spark.sql.functions._
    val keepers = graft.ext.Similarity.semDedupKeeperIndex(tables)
    val arrivals = tables.embeddings
      .filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id"),
        expr("transform(cast(embedding as array<double>)," +
          " x -> cast(floor(x * 1000000.0) as double))").as("mu"))
    val cents = graft.ext.Similarity.ivfCentroidsCached(tables)
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // default: keeper lists fit an executor -> broadcast probe
    val bcast = graft.ext.Similarity.semDedupServe(arrivals, keepers, cents)
    assert(plan(bcast).contains("BroadcastHashJoin"),
      s"keeper probe not broadcast:\n${plan(bcast)}")
    // index-scale mode: keepers partition by cell, nothing replicates —
    // the plan a 100 TB keeper index needs, with verdicts unchanged
    spark.conf.set("spark.graft.semdedup.broadcastIndex", "false")
    try {
      val shuffled = graft.ext.Similarity.semDedupServe(arrivals, keepers, cents)
      val p = plan(shuffled)
      assert(!p.contains("BroadcastHashJoin"), s"index still broadcast:\n$p")
      assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$p")
      assert(shuffled.orderBy("vec_id").collect().toSeq ==
        bcast.orderBy("vec_id").collect().toSeq)
    } finally spark.conf.unset("spark.graft.semdedup.broadcastIndex")
    graft.Engine.freeCheckpoint(keepers)
  }

  test("span alignments: hashed gram keys, one run window, no cartesian or fact sort") {
    val p = graft.ext.Dedup.qSpanAlignments(tables, checkpoint = false)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
    // the run-assembly window over (pair, diagonal) groups is the ONLY
    // window; a second one would mean a rank snuck into candidate gen
    assert("\\(\\d+\\) Window".r.findAllIn(p).length == 1,
      s"expected exactly one window:\n$p")
    // gram text must not cross an exchange: the join key is the 60-bit
    // md5 projection (plan shows conv/substring/md5, not a raw g key)
    assert(p.contains("md5"), s"gram hashing missing from plan:\n$p")
  }

  test("incremental dedup: gram index broadcast by default, conf-switched shuffled join, same verdicts") {
    // batch formulation of the stream-static join (the streaming drain
    // wraps exactly this frame): default replicates the corpus gram
    // index once; index-scale mode partitions it by gram instead — the
    // plan a 100 TB gram index needs — with verdicts unchanged
    val arrivals = tables.documents
    val corpus = tables.documents
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val bcast = graft.streaming.Streams.incrementalDedup(arrivals, corpus)
    assert(plan(bcast).contains("BroadcastHashJoin"),
      s"gram index not broadcast:\n${plan(bcast)}")
    spark.conf.set("spark.graft.incdedup.broadcastIndex", "false")
    try {
      val shuffled = graft.streaming.Streams.incrementalDedup(arrivals, corpus)
      val p = plan(shuffled)
      assert(!p.contains("BroadcastHashJoin"), s"index still broadcast:\n$p")
      assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$p")
      assert(shuffled.orderBy("id_new", "id_old").collect().toSeq ==
        bcast.orderBy("id_new", "id_old").collect().toSeq)
    } finally spark.conf.unset("spark.graft.incdedup.broadcastIndex")
  }

  test("contamination probe: eval gram set broadcast, doc stream never shuffles to meet it") {
    // batch formulation of the stream-static probe (drainContamination
    // wraps exactly this frame): the eval gram set is tiny and must
    // broadcast; a sort-merge fallback would shuffle every (doc, gram)
    // row of the training stream on the gram key
    val benchGrams = tables.documents
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(97)) === 0)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          graft.ext.Dedup.shingles(
            org.apache.spark.sql.functions.col("text"), 4))).as("gram"))
      .distinct()
    val p = graft.streaming.Streams
      .contaminationProbe(tables.documents, benchGrams)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"doc stream shuffled to meet the eval set:\n$p")
  }

  test("vocab growth: no window or global sort over the fact table, checkpoint joins broadcast") {
    // the selling point of the value-range checkpoint design is that NO
    // stage ranks or sorts the corpus: first-sight is a hash aggregate,
    // each cumulative count joins the 10-row bounds frame via broadcast
    val p = formatted("q_vocab_growth")
    assert(!p.contains(" Window"), s"rank window crept in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"bounds frame not broadcast:\n$p")
  }

  test("DoReMi mix: fact shuffles are the two count aggregates, epilogue is broadcast") {
    val p = graft.ext.Sampling.qMixDoremi(Tables(spark, sfDir), checkpoint = false)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // vocab-sized epilogue: corpus scalar row broadcast onto the
    // source-count frame; the k-row share window is allowed
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus frame not broadcast:\n$p")
  }

  test("SemDeDup: keep decision reads checkpointed frames, no fact rescan or cartesian") {
    // assignment and pairs are checkpointed inputs; the decision epilogue
    // is a left join + one keep-ranking window — a parquet scan here
    // means a stage re-derived the corpus
    val p = graft.ext.Similarity.qSemDedup(tables, checkpoint = false)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Scan parquet"), s"corpus re-scanned:\n$p")
    assert(!p.contains("CartesianProduct"), s"decision join went cartesian:\n$p")
    assert("\\(\\d+\\) Window".r.findAllIn(p).length <= 1,
      s"extra window spec:\n$p")
  }
}

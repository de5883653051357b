package graft.ops

import graft.Tables
import graft.transform.Transforms.dsum

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical / aggregate operator surface beyond plain sums.
  *
  * Engine-exact numerics: variance/stddev/correlation are computed from
  * DECIMAL-exact moment sums (sum x, sum x^2, sum x*y) and then a fixed
  * sequence of double operations — the built-in `stddev`/`corr` use
  * streaming update formulas whose result depends on aggregation order and
  * would not hash-match DuckDB.
  */
object Stats {

  private def s1(c: String) = sum(col(c).cast(DecimalType(18, 2))).cast("double")
  private def s2(c: String) =
    sum((col(c) * col(c)).cast(DecimalType(30, 4))).cast("double")
  private def sxy(x: String, y: String) =
    sum((col(x) * col(y)).cast(DecimalType(30, 4))).cast("double")

  /** Grouped variance / stddev / correlation from exact moments. */
  def qStats(t: Tables): DataFrame = {
    val n = count(lit(1)).cast("double")
    t.lineitem
      .groupBy("l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        s1("l_extendedprice").as("sx"),
        s2("l_extendedprice").as("sxx"),
        s1("l_quantity").as("sy"),
        s2("l_quantity").as("syy"),
        sxy("l_extendedprice", "l_quantity").as("sxy_"),
        n.as("nd"))
      .select(
        col("l_linestatus"),
        col("n"),
        // rounded well above double ulp at each magnitude: DuckDB's C++
        // build may fuse multiply-adds (FMA), so the last 1-2 ulps of
        // these composite expressions are not engine-portable
        round((col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1), 3)
          .as("var_price"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1)), 6)
          .as("stddev_price"),
        round((col("sxy_") - col("sx") * col("sy") / col("nd")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("nd")) *
           sqrt(col("syy") - col("sy") * col("sy") / col("nd"))), 9)
          .as("corr_price_qty"))
      .orderBy("l_linestatus")
  }

  /** Pairwise correlation matrix (long-form) across the three lineitem
    * measures per return flag — the same exact-moment recipe as [[qStats]]
    * generalized to all pairs: ONE scan computes every moment sum in a
    * single aggregation, the 3x3 (pairs x groups) matrix falls out of a
    * projection. round(_, 9) masks cross-engine FMA contraction on the
    * composite arithmetic.
    */
  def qCorrMatrix(t: Tables): DataFrame = {
    val ms = Seq("l_quantity", "l_extendedprice", "l_discount")
    val pairs = Seq(
      ("qty_price", "l_quantity", "l_extendedprice"),
      ("qty_disc", "l_quantity", "l_discount"),
      ("price_disc", "l_extendedprice", "l_discount"))
    val aggs =
      ms.flatMap(m => Seq(s1(m).as(s"s_$m"), s2(m).as(s"ss_$m"))) ++
        pairs.map { case (nm, x, y) => sxy(x, y).as(s"sp_$nm") }
    val grouped = t.lineitem
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), aggs: _*)
      .withColumn("nd", col("n").cast("double"))
    def corrOf(nm: String, x: String, y: String) =
      round((col(s"sp_$nm") - col(s"s_$x") * col(s"s_$y") / col("nd")) /
        (sqrt(col(s"ss_$x") - col(s"s_$x") * col(s"s_$x") / col("nd")) *
         sqrt(col(s"ss_$y") - col(s"s_$y") * col(s"s_$y") / col("nd"))), 9)
    grouped
      .select(col("l_returnflag"), col("n"), explode(array(pairs.map {
        case (nm, x, y) =>
          struct(lit(nm).as("pair"), corrOf(nm, x, y).as("corr"))
      }: _*)).as("p"))
      .select(col("l_returnflag"), col("p.pair").as("pair"), col("n"),
        col("p.corr").as("corr"))
      .orderBy("l_returnflag", "pair")
  }

  /** Plain min/max/sum/count per group; dates out as strings. */
  def qMinMax(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
        date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Argmax via group-max + equi-join back (deterministic under ties:
    * the max orderkey among max-price rows wins on both engines).
    */
  def qArgmax(t: Tables): DataFrame = {
    val m = t.lineitem
      .groupBy(col("l_returnflag").as("rf"))
      .agg(max("l_extendedprice").as("mp"))
    t.lineitem
      .join(broadcast(m),
        col("l_returnflag") === col("rf") && col("l_extendedprice") === col("mp"))
      .groupBy("l_returnflag")
      .agg(
        max("l_extendedprice").as("max_price"),
        max("l_orderkey").as("argmax_orderkey"))
      .orderBy("l_returnflag")
  }

  /** GROUPING SETS beyond rollup/cube — two independent dimensions plus
    * grand total, null keys coalesced for stable ordering.
    */
  def qGroupingSets(t: Tables): DataFrame = {
    val view = "orders_gs_" + java.util.UUID.randomUUID.toString.replace("-", "")
    t.orders
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("yr"))
      .createOrReplaceTempView(view)
    t.spark.sql(
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
            COALESCE(CAST(yr AS STRING), 'ALL') AS yr,
            COUNT(*) AS n
          FROM $view
          GROUP BY GROUPING SETS ((o_orderstatus), (yr), ())
          ORDER BY status, yr""")
  }

  /** UNION ALL + re-aggregate (bag semantics, vs the set-semantics
    * INTERSECT/EXCEPT queries).
    */
  def qUnionAll(t: Tables): DataFrame = {
    def keys(yr: Int) =
      t.orders.filter(year(col("o_orderdate")) === yr).select("o_custkey")
    keys(1997)
      .union(keys(1998))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  /** Supplier-side star join: revenue by supplier nation (broadcast dims,
    * single shuffle for the final small aggregate).
    */
  def qSupplierRevenue(t: Tables): DataFrame = {
    val supNation = broadcast(
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
    t.lineitem
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name")
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(24, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Sketch aggregate: HyperLogLog++ approximate distinct next to the
    * exact count (no oracle — sketch estimates are engine-specific; the
    * harness records a rows-only check and the unit test bounds the error).
    */
  def qApproxDistinct(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** Robust dispersion: median absolute deviation per group — the
    * outlier-resistant spread measure a profiling pass pairs with
    * variance (which a single bad row can dominate). Two exact-percentile
    * passes: group medians broadcast back onto the rows, then the median
    * of absolute deviations. Exact percentiles sort within the group, so
    * both engines produce identical doubles.
    */
  def qMad(t: Tables): DataFrame = {
    val med = t.lineitem
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("med_price"))
    t.lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
      .join(broadcast(med), "l_returnflag")
      .withColumn("adev", abs(col("l_extendedprice") - col("med_price")))
      .groupBy("l_returnflag")
      .agg(
        first(col("med_price")).as("med_price"),
        expr("percentile(adev, 0.5D)").as("mad"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Quantile sketch next to the exact answer: approx_percentile is the
    * single-pass mergeable summary a 100 TB profile pass uses (exact
    * percentiles need a full sort per group); the exact value rides along
    * so the harness rows-check and the unit test can bound sketch error.
    * No oracle — sketch internals are engine-specific.
    */
  def qApproxQuantile(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact_median"),
        approx_percentile(col("l_extendedprice"), lit(0.9), lit(1000))
          .as("approx_p90"),
        percentile(col("l_extendedprice"), lit(0.9)).as("exact_p90"))
      .orderBy("l_returnflag")

  /** Equi-width histogram of order values: floor-division bucketing + one
    * grouped aggregate (the profile view a warehouse computes before
    * choosing bin boundaries).
    */
  def qHistogram(t: Tables, width: Double = 50000.0): DataFrame =
    t.orders
      .withColumn("bucket", floor(col("o_totalprice") / width).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"))
      .orderBy("bucket")

  /** Data-quality audit: referential-integrity orphan counts across the
    * star schema plus key-uniqueness, as one summary row — the constraint
    * checks a warehouse load runs before publishing (extends the
    * reference's health-monitoring theme, etl_pipeline.py:317-348).
    * Each check is an anti-join or grouped HAVING that Spark executes as
    * a broadcast/shuffled hash join — no row-by-row validation.
    */
  def qIntegrityChecks(t: Tables): DataFrame = {
    def scalar(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as(name))
    // bind each reader once: Tables.* returns a fresh plan (new attribute
    // ids) per call, so join conditions must reference the same instance
    val (orders, customer, lineitem, part) =
      (t.orders, t.customer, t.lineitem, t.part)
    val orphanOrders = scalar(
      orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti"),
      "orphan_orders")
    val orphanLineitems = scalar(
      lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti"),
      "orphan_lineitems")
    val orphanParts = scalar(
      lineitem.join(part,
        lineitem("l_partkey") === part("p_partkey"), "left_anti"),
      "orphan_parts")
    val dupCustkeys = scalar(
      customer.groupBy("c_custkey").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1),
      "dup_custkeys")
    orphanOrders.crossJoin(orphanLineitems)
      .crossJoin(orphanParts).crossJoin(dupCustkeys)
  }

  /** Regex extraction + aggregate (codegen'd regexp_extract). */
  def qRegexpExtract(t: Tables): DataFrame =
    t.orders
      .withColumn("prio_num",
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).cast("long"))
      .groupBy("prio_num")
      .agg(count(lit(1)).as("n"), countDistinct("o_custkey").as("n_custs"))
      .orderBy("prio_num")

  /** Heavy-hitter detection with a count-min-sketch prefilter: users with
    * more than `threshold` events. The CMS (Spark's built-in
    * `count_min_sketch` aggregate) is built in ONE partial-aggregated pass
    * over events — no shuffle of event rows, just sketch merges — then the
    * key dimension (customer, which covers the event keyspace) is probed
    * map-only via the native [[graft.functions.CmsEstimate]]. CMS only
    * OVERcounts, so the candidate set can contain false positives but never
    * misses a true heavy hitter; the exact verify join then touches only
    * candidate keys' events. Output is exact, so the oracle is a plain
    * GROUP BY / HAVING — the sketch machinery changes the plan shape, not
    * the answer (same grading pattern as the bloom-prefiltered join).
    * At 100 TB: the full-shuffle GROUP BY over every key disappears;
    * what's left is one sketch aggregate + a broadcast-sized candidate join.
    */
  def qHeavyHitters(
      spark: org.apache.spark.sql.SparkSession,
      t: Tables,
      threshold: Long = 80L): DataFrame = {
    t.createViews()
    spark.sql(
      s"""WITH cand AS (
            SELECT c_custkey AS user_id FROM customer
            WHERE cms_estimate(
              (SELECT count_min_sketch(user_id, 0.001d, 0.99d, 42)
                 FROM events),
              c_custkey) > ${threshold}L)
          SELECT e.user_id, count(*) AS n_events
          FROM events e JOIN cand ON e.user_id = cand.user_id
          GROUP BY e.user_id
          HAVING count(*) > ${threshold}L
          ORDER BY user_id""")
  }

  /** Z-score outlier detection: top-5 orders by |z| within each market
    * segment, z computed against the segment's mean/stddev from the same
    * exact-moment recipe as [[qStats]]. The 5-row moment frame broadcasts
    * back onto the fact side (no second fact shuffle); the per-segment
    * top-5 is a bounded window. Ranking safety: adjacent |z| values are
    * ≥ 0.01/sd ≈ 1e-7 apart (prices are cents), far above the ~1e-16
    * cross-engine FMA jitter, so the rank-5 cutoff cannot flip; the output
    * z is rounded at 1e-6 like every composite double here.
    */
  def qZscoreOutliers(t: Tables): DataFrame = {
    val seg = t.orders
      .join(t.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        col("o_totalprice"))
    val m = seg
      .groupBy("segment")
      .agg(
        count(lit(1)).cast("double").as("nd"),
        s1("o_totalprice").as("sx"),
        s2("o_totalprice").as("sxx"))
      .withColumn("mean", col("sx") / col("nd"))
      .withColumn("sd",
        sqrt((col("sxx") - col("sx") * col("sx") / col("nd")) /
          (col("nd") - 1)))
      .select("segment", "mean", "sd")
    val w = Window.partitionBy("segment")
      .orderBy(abs(col("z")).desc, col("o_orderkey"))
    seg
      .join(broadcast(m), "segment")
      .withColumn("z", (col("o_totalprice") - col("mean")) / col("sd"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("segment"), col("o_orderkey"), round(col("z"), 6).as("z"))
      .orderBy("segment", "o_orderkey")
  }

  /** Chi-square independence test of market segment vs customer nation:
    * the full R x C contingency grid (zero cells densified via the
    * cross-joined marginals — a missing cell still contributes its
    * expectation), expected counts from exact integer marginals, each
    * (o-e)^2/e term rounded at 1e-9 into DECIMAL so the grid sum is
    * aggregation-order exact. Marginals are two tiny aggregates of the
    * contingency frame; nothing beyond the first groupBy touches fact
    * rows. Squares are spelled (o-e)*(o-e) — `pow` is not guaranteed
    * bit-identical across engines' libm.
    */
  def qChi2(t: Tables): DataFrame = {
    val obs = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("n_name").as("nat"))
      .agg(count(lit(1)).as("o"))
    val segTot = obs.groupBy("seg").agg(sum("o").as("rt"))
    val natTot = obs.groupBy("nat").agg(sum("o").as("ct"))
    val n = obs.agg(sum("o").as("n"))
    segTot.crossJoin(natTot).crossJoin(broadcast(n))
      .join(obs, Seq("seg", "nat"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("e",
        col("rt").cast("double") * col("ct").cast("double") /
          col("n").cast("double"))
      .withColumn("d", col("o").cast("double") - col("e"))
      .withColumn("term",
        round(col("d") * col("d") / col("e"), 9).cast("decimal(20,10)"))
      .agg(
        sum("term").cast("double").as("chi2"),
        count(lit(1)).as("n_cells"),
        ((countDistinct("seg") - 1) * (countDistinct("nat") - 1))
          .as("dof"))
  }

  /** The CMS candidate stage alone (false positives included) — exposed so
    * tests can assert the prefilter prunes the dimension yet stays a
    * superset of the true heavy hitters.
    */
  def cmsCandidatesOnly(
      spark: org.apache.spark.sql.SparkSession,
      t: Tables,
      threshold: Long = 80L): DataFrame = {
    t.createViews()
    spark.sql(
      s"""SELECT c_custkey AS user_id FROM customer
          WHERE cms_estimate(
            (SELECT count_min_sketch(user_id, 0.001d, 0.99d, 42) FROM events),
            c_custkey) > ${threshold}L
          ORDER BY user_id""")
  }
}

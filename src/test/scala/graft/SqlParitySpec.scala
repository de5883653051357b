package graft

/** The SQL frontend generalizes: re-run a spread of the oracled relational
  * queries from SQL TEXT over the registered views (Catalyst parse ->
  * analyze -> optimize) and assert row-identity with the DataFrame
  * formulations the driver grades. One query through `spark.sql`
  * (q_sql_frontend) proves the wiring; this proves the dialect surface —
  * aggregates, exact decimal sums, windows, set ops, ROLLUP/CUBE, HAVING,
  * ORDER/LIMIT — all parse and plan to the same results.
  */
class SqlParitySpec extends SparkSuite {

  private val sqlTwins: Seq[(String, String)] = Seq(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= CAST('2001-09-02' AS TIMESTAMP_NTZ)
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
           date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_date, o_orderkey""",
    "q_sort_limit" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
         ORDER BY o_custkey""",
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
         ORDER BY o_custkey""",
    "q_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_minmax" ->
      """SELECT l_returnflag,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           date_format(min(l_shipdate), 'yyyy-MM-dd') AS min_ship,
           date_format(max(l_shipdate), 'yyyy-MM-dd') AS max_ship,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_union_all" ->
      """SELECT o_custkey, COUNT(*) AS n FROM (
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
           UNION ALL
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
         GROUP BY o_custkey ORDER BY o_custkey""",
    "q_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(CAST(yr AS STRING), 'ALL') AS yr,
           COUNT(*) AS n
         FROM (SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders)
         GROUP BY GROUPING SETS ((o_orderstatus), (yr), ())
         ORDER BY status, yr""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    "q_semi_join" ->
      """SELECT p_partkey, p_brand FROM part p
         WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
         ORDER BY p_partkey""",
    "q_above_customer_avg" ->
      """WITH a AS (SELECT o_custkey AS ck,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
           FROM orders GROUP BY o_custkey)
         SELECT o_orderkey, o_custkey, o_totalprice, avg_price AS cust_avg
         FROM orders JOIN a ON o_custkey = ck
         WHERE o_totalprice > avg_price
         ORDER BY o_orderkey""",
    "q_group_having" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM orders GROUP BY 1, 2 HAVING COUNT(*) >= 10
         ORDER BY yr, o_orderstatus""",
    "q_moving_avg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, ma5 FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS ma5
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         WHERE o_orderkey % 100 = 0 ORDER BY o_custkey, o_orderkey""",
    "q_window_shares" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, cust_total, share, cd
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
             o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey) AS DOUBLE) AS share,
             cume_dist() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice, o_orderkey) AS cd
           FROM orders)
         WHERE o_orderkey % 100 = 0 ORDER BY o_custkey, o_orderkey""",
    "q_yoy_growth" ->
      """WITH y AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2)
         SELECT yr, n_name, rev,
           lag(rev, 1) OVER w AS prev_rev,
           (rev - lag(rev, 1) OVER w) / lag(rev, 1) OVER w AS growth
         FROM y WINDOW w AS (PARTITION BY n_name ORDER BY yr)
         ORDER BY n_name, yr""",
    "q_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey,
           date_format(o_orderdate, 'yyyy-MM-dd') AS valid_from,
           date_format(next_date, 'yyyy-MM-dd') AS valid_to,
           CAST(CASE WHEN next_date IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS next_date
           FROM orders)
         WHERE o_custkey % 50 = 0
         ORDER BY o_custkey, valid_from, o_orderkey""",
    "q_benford" ->
      """WITH d AS (
           SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING), 1, 1) AS digit
           FROM orders),
         g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
         SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS freq,
           round(log10(1.0D + 1.0D / CAST(digit AS DOUBLE)), 6) AS expected
         FROM g ORDER BY digit""",
    "q_decile_lift" ->
      """WITH c AS (
           SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
           FROM orders GROUP BY o_custkey),
         d AS (
           SELECT spend,
             CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS decile
           FROM c),
         g AS (
           SELECT decile, COUNT(*) AS n_customers, SUM(spend) AS decile_rev
           FROM d GROUP BY decile)
         SELECT decile, n_customers,
           CAST(decile_rev AS DOUBLE) AS decile_rev,
           CAST(decile_rev AS DOUBLE) / CAST(SUM(decile_rev) OVER () AS DOUBLE) AS share,
           CAST(SUM(decile_rev) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(decile_rev) OVER () AS DOUBLE) AS cum_share
         FROM g ORDER BY decile""",
    "q_attribution" ->
      """WITH a AS (
           SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click','view')
                 THEN event_type END) IGNORE NULLS OVER
               (PARTITION BY user_id ORDER BY ts_ns, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
           FROM events)
         SELECT COALESCE(touch, 'none') AS touch,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM a WHERE event_type = 'purchase'
         GROUP BY COALESCE(touch, 'none') ORDER BY touch""",
    "q_interval_union" ->
      """WITH e AS (
           SELECT user_id, event_id, ts_ns div 1000 AS ts_us,
             ts_ns div 1000 + 300000000L AS end_us
           FROM events),
         g AS (
           SELECT user_id, event_id, ts_us, end_us,
             CASE WHEN max(end_us) OVER w IS NULL OR ts_us > max(end_us) OVER w
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         i AS (
           SELECT user_id, ts_us, end_us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM g),
         isl AS (
           SELECT user_id, island, MIN(ts_us) AS s, MAX(end_us) AS e
           FROM i GROUP BY user_id, island)
         SELECT user_id, COUNT(*) AS n_islands, SUM(e - s) AS covered_us
         FROM isl GROUP BY user_id ORDER BY user_id""",
    "q_gini" ->
      """WITH c AS (
           SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
           FROM orders GROUP BY o_custkey),
         r AS (
           SELECT spend,
             CAST(row_number() OVER (ORDER BY spend, o_custkey) AS BIGINT) AS i
           FROM c),
         s AS (
           SELECT COUNT(*) AS n_customers, SUM(spend) AS sx,
             SUM(CAST(spend AS DECIMAL(14,2)) * CAST(i AS DECIMAL(10,0))) AS six
           FROM r)
         SELECT n_customers, CAST(sx AS DOUBLE) AS total_spend,
           round(2.0D * CAST(six AS DOUBLE) /
               (CAST(n_customers AS DOUBLE) * CAST(sx AS DOUBLE)) -
             (CAST(n_customers AS DOUBLE) + 1.0D) / CAST(n_customers AS DOUBLE),
             9) AS gini
         FROM s""",
    "q_mode_category" ->
      """WITH c AS (
           SELECT o_orderstatus AS status,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             o_orderpriority AS priority, COUNT(*) AS n
           FROM orders GROUP BY 1, 2, 3),
         w AS (
           SELECT *, row_number() OVER (PARTITION BY status, yr
               ORDER BY n DESC, priority) AS rk,
             SUM(n) OVER (PARTITION BY status, yr) AS total
           FROM c)
         SELECT status, yr, priority AS mode_priority, n AS n_mode,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS mode_share
         FROM w WHERE rk = 1 ORDER BY status, yr""",
    "q_ship_streaks" ->
      """WITH days AS (
           SELECT DISTINCT l_suppkey, to_date(l_shipdate) AS day FROM lineitem),
         runs AS (
           SELECT l_suppkey,
             datediff(day, DATE '1970-01-01')
               - row_number() OVER (PARTITION BY l_suppkey ORDER BY day) AS grp
           FROM days),
         lens AS (
           SELECT l_suppkey, grp, COUNT(*) AS run_len FROM runs GROUP BY 1, 2)
         SELECT l_suppkey, MAX(run_len) AS longest_streak_days,
           COUNT(*) AS n_streaks, CAST(SUM(run_len) AS BIGINT) AS n_ship_days
         FROM lens GROUP BY l_suppkey ORDER BY l_suppkey""",
    "q_rate_limit" ->
      """WITH r AS (
           SELECT event_type,
             CASE WHEN row_number() OVER (
                 PARTITION BY user_id, (ts_ns div 1000) div 60000000
                 ORDER BY ts_ns div 1000, event_id) <= 2
               THEN 1 ELSE 0 END AS kept
           FROM events)
         SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped
         FROM r GROUP BY event_type ORDER BY event_type""",
    "q_hhi_concentration" ->
      """WITH rev AS (
           SELECT r_name, s_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(24,6))) AS DECIMAL(18,6)) AS rev
           FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, s_suppkey)
         SELECT r_name, COUNT(*) AS n_suppliers,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           round(10000.0D * CAST(SUM(rev * rev) AS DOUBLE)
             / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)), 9) AS hhi
         FROM rev GROUP BY r_name ORDER BY r_name""",
    "q_winsorize" ->
      """WITH seg AS (
           SELECT c_mktsegment AS segment, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey),
         b AS (
           SELECT segment,
             CAST(percentile(o_totalprice, 0.05D) AS DECIMAL(18,4)) AS p05d,
             CAST(percentile(o_totalprice, 0.95D) AS DECIMAL(18,4)) AS p95d
           FROM seg GROUP BY segment)
         SELECT segment, CAST(p05d AS DOUBLE) AS p05,
           CAST(p95d AS DOUBLE) AS p95, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_raw,
           CAST(SUM(LEAST(GREATEST(CAST(o_totalprice AS DECIMAL(18,4)), p05d),
               p95d)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_winsorized
         FROM seg JOIN b USING (segment)
         GROUP BY segment, p05d, p95d ORDER BY segment""")

  test("SQL text reproduces the graded DataFrame formulations row-for-row") {
    tables.createViews()
    sqlTwins.foreach { case (name, sql) =>
      val viaSql = spark.sql(sql)
      val viaDf = SparkEntry.queries(name)(spark, sfDir)
      assert(viaSql.columns.toSeq == viaDf.columns.toSeq,
        s"$name: column names diverge")
      val a = viaSql.collect().toSeq
      val b = viaDf.collect().toSeq
      assert(a.size == b.size, s"$name: row counts diverge (${a.size} vs ${b.size})")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"$name: row $i diverges: $ra vs $rb")
      }
    }
  }

  test("LATERAL top-n per group matches the ranking-window formulation") {
    val lat = graft.ops.Relational.qLateralTopn(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(lat.size == 15) // 5 regions x top-3
    val win = spark.sql(
      """SELECT r_name, c_name, c_acctbal FROM (
           SELECT r.r_name, c.c_name, c.c_acctbal,
             row_number() OVER (PARTITION BY r.r_regionkey
               ORDER BY c.c_acctbal DESC, c.c_name) AS rn
           FROM region r
             JOIN nation n ON n.n_regionkey = r.r_regionkey
             JOIN customer c ON c.c_nationkey = n.n_nationkey)
         WHERE rn <= 3
         ORDER BY r_name, c_acctbal DESC, c_name""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(lat == win)
  }

  test("KMV oracle hex decode replays engine-independently (ascii/CASE arithmetic == conv)") {
    // the q_kmv_distinct oracle decodes a 15-char md5 prefix with pure
    // ascii()/substr()/CASE arithmetic — the least version-sensitive SQL
    // surface available. That arithmetic is ANSI enough to also run in
    // Spark SQL, so replay it here as a third engine (beyond Spark's
    // conv() and dev DuckDB) and demand bit-identity with
    // conv(substring(md5(x),1,15),16,10) on every lineitem partkey.
    val decode = SparkEntry.hexDecode60("m")
    val diverging = spark.sql(
      s"""SELECT m, $decode AS arith,
            CAST(conv(substring(m, 1, 15), 16, 10) AS BIGINT) AS via_conv
          FROM (SELECT md5(CAST(l_partkey AS STRING)) AS m FROM lineitem)
          WHERE ($decode) <> CAST(conv(substring(m, 1, 15), 16, 10) AS BIGINT)""")
      .collect()
    assert(diverging.isEmpty,
      s"arithmetic decode diverges from conv on: ${diverging.take(3).mkString(", ")}")
  }
}

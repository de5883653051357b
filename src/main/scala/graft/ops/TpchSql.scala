package graft.ops

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The rest of the TPC-H sweep through the SQL frontend (Q5/6/10/14/18/
  * 19/22 live in [[Analytics]]; this object completes the set with Q1, Q3,
  * Q4, Q7, Q8, Q12, Q13, Q15, Q17 and Q21, plus schema-adapted analogues of
  * the five partsupp-dependent queries Q2/Q9/Q11/Q16/Q20 — the testdata
  * has no partsupp table, no commit/receipt dates and no ship modes, so
  * supply cost/stock terms re-derive from lineitem (unit price, shipped
  * quantity, retail-price cost proxy), lateness predicates from
  * `l_shipdate - o_orderdate`, and each analogue keeps its original's
  * STRUCTURAL challenge: Q2's correlated MIN over a twice-referenced CTE,
  * Q9's profit expression over a five-table join, Q11's HAVING against
  * scalar-subquery thresholds, Q16's COUNT DISTINCT with a NOT IN guard,
  * Q20's IN over a grouped HAVING with a correlated scalar subquery.
  *
  * Every text here is deliberately DUAL-DIALECT: the same string parses and
  * evaluates identically in Spark SQL and in DuckDB, so the registered
  * oracle IS the query constant — the two sides cannot drift. That forces
  * the cross-engine numeric rules from the verify notes: exact decimal
  * sums surfaced as doubles, averages as double divisions of exact sums
  * (bit-identical in both engines), integer counts CAST to BIGINT, and a
  * total ORDER BY on every multi-row result.
  *
  * What each query adds over the already-covered frontend surface:
  *  - Q1  full aggregate battery incl. triple-product decimal charge
  *  - Q4  correlated EXISTS whose inner predicate references an outer
  *        column NON-equally (shipdate vs. orderdate + interval)
  *  - Q7  self-joined dimension (nation twice) + disjunctive pair filter
  *  - Q8  nested-subquery market share (conditional sum over a 7-join tree)
  *  - Q12 CASE bucketing inside an aggregate over a fact-fact join
  *  - Q13 LEFT JOIN with a join-clause filter + double aggregation
  *  - Q15 CTE referenced twice (revenue view + scalar MAX over it)
  *  - Q17 correlated scalar subquery (per-part average) under a join
  *  - Q21 EXISTS + NOT EXISTS both correlated with non-equi outer refs
  */
object TpchSql {

  def run(spark: SparkSession, t: Tables, sql: String): DataFrame = {
    t.createViews()
    spark.sql(sql)
  }

  /** Q1: pricing summary. Scan-dominant single aggregate; every measure is
    * an exact decimal sum. The disc-price/charge products round each FACTOR
    * to its exact decimal domain (prices are 2-dec, discount/tax 2-dec in
    * the testdata — unambiguous in both engines since the stored double is
    * within 1e-13 of the true value) and then multiply in exact decimal
    * arithmetic, so no per-row double→decimal rounding of a computed
    * product exists anywhere — that rounding is where Spark and DuckDB
    * disagree (different tie resolution near double's precision edge).
    * Averages are double divisions of those sums. The wide-scale sums
    * (scale 6/10) additionally round to 2 decimals BEFORE the double cast:
    * an exact high-scale decimal surfaced as double is a two-rounding path
    * in DuckDB (scaled int128 → double, then / 10^s) vs one correctly-
    * rounded conversion in Spark — a deterministic 1-ulp split seen at
    * sf0.001; at scale 2 the scaled integer stays under 2^53 and both
    * engines convert exactly. At 100 TB this
    * is the canonical map-side-combine query: 6 groups total, so partial
    * aggregation collapses each task to 6 rows before the single exchange.
    */
  val q1: String =
    """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_disc_price,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
         COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** Q3 (shipping priority): the classic two-fact join funnel — segment
    * filter on the customer dim, date split across orders/lineitem, revenue
    * per un-shipped order, top 10. `o_orderpriority` stands in for the
    * reference schema's missing `o_shippriority` (a projected passenger
    * column either way). Revenue accumulates as exact decimal (order-free,
    * engine-identical) and surfaces as double; the LIMIT 10 rides a TOTAL
    * order (revenue DESC, then orderdate, then the unique orderkey), so
    * the cut line cannot differ between engines even under revenue ties.
    * At scale: customer broadcasts; the orders↔lineitem join shuffles on
    * the orderkey; the top-10 is a partial-aggregated TakeOrdered, no
    * global sort materializes.
    */
  val q3: String =
    """SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
         o_orderdate, o_orderpriority
       FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
         AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, o_orderdate, l_orderkey
       LIMIT 10"""

  /** Q4 (order priority checking), adapted: "late" = some line shipped more
    * than 60 days after the order date. The correlated EXISTS carries an
    * outer reference inside a NON-equi predicate — Catalyst decorrelates it
    * to a left-semi join on the orderkey with the date comparison as a join
    * condition, so the fact table never re-scans per order.
    */
  val q4: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** Q7 (volume shipping), adapted to region pairs so the answer is
    * non-empty at every SF: revenue flowing between regions 1 and 2 in
    * either direction, by supplier nation x customer nation x year. The
    * nation dimension joins TWICE (n1 = supplier side, n2 = customer side);
    * both broadcast, the two fact joins shuffle on their keys.
    */
  val q7: String =
    """SELECT supp_nation, cust_nation, l_year,
         CAST(SUM(volume) AS DOUBLE) AS revenue, COUNT(*) AS n_items
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS volume
         FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_regionkey = 1 AND n2.n_regionkey = 2)
             OR (n1.n_regionkey = 2 AND n2.n_regionkey = 1))
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year"""

  /** Q8 (national market share): NATION_3's share of ECONOMY-part revenue
    * sold into AMERICA, per order year. Seven-table join tree where every
    * dimension broadcasts and only the three fact-sized joins shuffle; the
    * share is a conditional decimal sum over the total decimal sum, divided
    * once in doubles.
    */
  val q8: String =
    """SELECT o_year,
         CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
               ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
         COUNT(*) AS n_items
       FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS volume,
           n2.n_name AS nation
         FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
       GROUP BY o_year
       ORDER BY o_year"""

  /** Q12 (shipping speed vs priority), adapted: ship-lag buckets stand in
    * for the missing ship modes. One fact-fact join, CASE bucketing, two
    * conditional integer sums (CAST to BIGINT — DuckDB sums BIGINT into
    * HUGEINT otherwise).
    */
  val q12: String =
    """SELECT ship_speed,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM (SELECT o_orderpriority,
           CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'FAST'
                WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'NORMAL'
                ELSE 'SLOW' END AS ship_speed
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
       GROUP BY ship_speed
       ORDER BY ship_speed"""

  /** Q13 (customer order-count distribution): LEFT JOIN keeps the
    * zero-order customers (the filter lives in the JOIN clause, not WHERE,
    * which is the whole point of the query), then a second aggregation over
    * the counts. Order-priority filter stands in for the missing comment
    * LIKE.
    */
  val q13: String =
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           AND o_orderpriority <> '1-URGENT'
         GROUP BY c_custkey) c_orders
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

  /** Q15 (top supplier): the revenue CTE is referenced twice — once joined
    * to supplier, once under a scalar MAX. The equality against the max is
    * DECIMAL = DECIMAL, exact in both engines (the double cast happens only
    * on output). Catalyst plans the scalar subquery as a one-row broadcast.
    */
  val q15: String =
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       ORDER BY s_suppkey"""

  /** Q17 (small-quantity orders): correlated scalar subquery — each part's
    * own average quantity sets its threshold. l_quantity is integral-valued
    * (1..50), so the per-part double AVG is an exact-integer sum over a
    * count: order-independent and bit-identical across engines, making the
    * `<` threshold comparison deterministic. Catalyst decorrelates to an
    * aggregate-then-join on partkey.
    */
  val q17: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
         COUNT(*) AS n_items
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
         AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                           WHERE l2.l_partkey = p_partkey)"""

  /** Q21 (suppliers who kept orders waiting), adapted: on a finished ('F')
    * order, this supplier shipped >90 days late, ANOTHER supplier was on
    * the order (EXISTS), and NO other supplier was also late (NOT EXISTS) —
    * both subqueries correlated, both carrying the outer order date in a
    * non-equi predicate. The decorrelation plans three lineitem-vs-lineitem
    * semi/anti joins on the orderkey — the stress test for the subquery
    * rewriter.
    */
  val q21: String =
    """SELECT s_name, COUNT(*) AS numwait
       FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
       WHERE o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                     WHERE l3.l_orderkey = l1.l_orderkey
                       AND l3.l_suppkey <> l1.l_suppkey
                       AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
         AND n_nationkey % 3 = 1
       GROUP BY s_name
       ORDER BY numwait DESC, s_name
       LIMIT 100"""

  /** Q2 analogue (minimum-cost supplier): supply cost re-derives as the
    * minimum observed unit price (`l_extendedprice / l_quantity`, a raw
    * double division — bit-identical across engines) per (part, supplier)
    * within the EUROPE region. Structure preserved from Q2: a CTE
    * referenced twice — once as a fact, once inside a correlated scalar
    * MIN keyed by the outer part — plus the four-dimension join and the
    * acctbal-ranked LIMIT. Catalyst decorrelates the MIN into an
    * aggregate-join; the CTE is part×supplier-sized, never fact-sized.
    */
  val q2: String =
    """WITH cost AS (
         SELECT l.l_partkey AS partkey, s.s_suppkey AS suppkey,
                MIN(l.l_extendedprice / l.l_quantity) AS unitcost
         FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'EUROPE'
         GROUP BY 1, 2)
       SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
              c.unitcost
       FROM part p
         JOIN cost c ON c.partkey = p.p_partkey
         JOIN supplier s ON c.suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE p.p_size BETWEEN 10 AND 20
         AND c.unitcost = (SELECT MIN(c2.unitcost) FROM cost c2
                           WHERE c2.partkey = p.p_partkey)
       ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
       LIMIT 25"""

  /** Q9 analogue (product-type profit): the ps_supplycost term re-derives
    * as a 60% retail-price cost proxy. All profit arithmetic stays in
    * exact decimal (each factor cast to its exact stored domain, products
    * and the subtraction in decimal, one round-to-2 before the double
    * surface), so the five-join aggregation is order-free. EXTRACT year
    * is CAST to BIGINT because the two engines disagree on its native
    * width.
    */
  val q9: String =
    """SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(SUM(
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l.l_discount AS DECIMAL(8,4))
           - CAST(p.p_retailprice AS DECIMAL(18,2))
             * CAST(l.l_quantity AS DECIMAL(18,2))
             * CAST(0.6 AS DECIMAL(2,1))
         ), 2) AS DOUBLE) AS sum_profit
       FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE p.p_name LIKE '%widget%'
       GROUP BY 1, 2
       ORDER BY nation, o_year DESC"""

  /** Q11 analogue (important stock): per-part "inventory value" re-derives
    * as revenue shipped by one nation's suppliers. Q11's structural point
    * survives intact — a GROUP BY whose HAVING compares against scalar
    * subqueries over the SAME grouped CTE — but the original's fixed
    * fraction is replaced by a scale-free 2×-average threshold (two
    * scalar subqueries instead of one), so the selectivity is stable
    * across scale factors. All comparisons are exact decimal×integer.
    */
  val q11: String =
    """WITH val AS (
         SELECT l.l_partkey AS partkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
         FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_name = 'NATION_3'
         GROUP BY 1)
       SELECT partkey, CAST(value AS DOUBLE) AS value
       FROM val
       WHERE value * (SELECT CAST(COUNT(*) AS BIGINT) FROM val) >
             2 * (SELECT SUM(value) FROM val)
       ORDER BY value DESC, partkey"""

  /** Q16 analogue (supplier counts by part attributes): the part-supplier
    * relationship re-derives from observed lineitem pairs; the
    * "complaints" exclusion becomes a low-balance supplier NOT IN guard.
    * Structure preserved: COUNT(DISTINCT) per attribute triple, inequality
    * + IN-list part filters, a non-correlated NOT IN subquery, and the
    * count-ranked total order.
    */
  val q16: String =
    """SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
         CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
         AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
         AND l.l_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
       GROUP BY 1, 2, 3
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q20 analogue (excess-stock suppliers): "availqty > half the shipped
    * quantity" re-derives as suppliers who shipped more than 10% of a
    * part's all-time quantity within a two-year window. The gauntlet Q20
    * exercises survives whole: an IN subquery whose GROUP BY carries a
    * HAVING that itself holds a correlated scalar subquery (per-part
    * total), under a nation filter. Quantities compare as exact decimals
    * via an integer multiplier (×10 > total ⇔ share > 10%) — no ratio
    * rounding anywhere.
    */
  val q20: String =
    """SELECT s.s_name
       FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE n.n_name = 'NATION_3' AND s.s_suppkey IN (
         SELECT l.l_suppkey FROM lineitem l
         WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l.l_suppkey, l.l_partkey
         HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * 10 >
           (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
       ORDER BY s_name"""

  /** Recursive CTE through the SQL frontend (WITH RECURSIVE, supported by
    * both Spark 4's recursion-enabled CTE resolution and DuckDB): every
    * customer walks the decimal-prefix parent forest (parent(c) =
    * floor(c/10) when that key exists) up to its root, then the per-depth
    * census rolls up. Same closure semantics as the driver-looped
    * [[Graph.qHierarchyFlatten]], but the ITERATION itself is planned by
    * the engine's recursive-union operator — the frontend feature a
    * BOM-explosion or org-chart user reaches for first.
    *
    * Dual-dialect notes: integer parent derivation via
    * CAST(FLOOR(node / 10.0) AS BIGINT) (both engines floor the same
    * IEEE quotient; `div` vs `//` would split the dialects), depth CAST
    * to BIGINT in the epilogue, total ORDER BY. Recursion depth is
    * bounded by log10 of the key domain (≤ 7 at any SF), far under both
    * engines' recursion limits — the loop count is scale-free even
    * though each level's join is fact-sized.
    */
  val recursive: String =
    """WITH RECURSIVE walk AS (
         SELECT c_custkey AS id, c_custkey AS node, 0 AS depth
         FROM customer
         UNION ALL
         SELECT w.id, p.c_custkey AS node, w.depth + 1
         FROM walk w JOIN customer p
           ON p.c_custkey = CAST(FLOOR(w.node / 10.0) AS BIGINT)
          AND p.c_custkey <> w.node),
       tops AS (SELECT id, MAX(depth) AS d FROM walk GROUP BY id),
       roots AS (SELECT w.id, w.node AS root, w.depth
                 FROM walk w JOIN tops t ON w.id = t.id AND w.depth = t.d)
       SELECT CAST(depth AS BIGINT) AS depth,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
         CAST(MIN(id) AS BIGINT) AS min_id,
         CAST(MAX(id) AS BIGINT) AS max_id
       FROM roots GROUP BY depth ORDER BY depth"""

  /** PIVOT through the SQL frontend: per-source character volume spread
    * across the language domain as columns — the reshape every BI layer
    * asks of an engine. NOT dual-dialect (DuckDB's PIVOT grammar
    * differs), so unlike the entries in [[all]] this text is registered
    * with a hand-written CASE-aggregation oracle; absent cells are NULL
    * in both engines. The lang list is part of the query spec (PIVOT IN
    * lists are static by design — a dynamic domain needs the DataFrame
    * pivot, which scans the domain first).
    */
  val pivotSpark: String =
    """SELECT * FROM (SELECT source, lang, n_chars FROM documents)
       PIVOT (SUM(n_chars) FOR lang IN
         ('de' AS de, 'en' AS en, 'es' AS es, 'fr' AS fr, 'zh' AS zh))
       ORDER BY source"""

  /** UNPIVOT through the SQL frontend — the inverse reshape of
    * [[pivotSpark]]: the four lineitem measures fold to (measure, val)
    * long form in one scan-side projection (no join, no shuffle beyond
    * the sort). Like PIVOT, NOT dual-dialect (DuckDB's UNPIVOT grammar
    * differs), so the oracle hand-lowers the fold as a 4-way
    * UNION ALL. Spark's UNPIVOT drops NULL values by default and so
    * does a lateral-VALUES lowering — the measures here are all
    * non-null, keeping the two semantics identical.
    */
  val unpivotSpark: String =
    """SELECT l_orderkey, l_linenumber, measure, val
       FROM (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               l_quantity, l_extendedprice, l_discount, l_tax
             FROM lineitem WHERE l_orderkey % 500 = 0)
       UNPIVOT (val FOR measure IN
         (l_quantity, l_extendedprice, l_discount, l_tax))
       ORDER BY l_orderkey, l_linenumber, measure"""

  /** Multiset set operations through the frontend: INTERSECT ALL /
    * EXCEPT ALL over the two year cohorts — the bag semantics
    * (min/difference of multiplicities) that DISTINCT-flavored set ops
    * silently destroy, and that both engines implement identically.
    * Dual-dialect; each set op is isolated in its own CTE so no
    * precedence rule is exercised differently across parsers. The
    * aggregate epilogue (row count, distinct count, key checksum) makes
    * the multiplicity semantics hash-visible.
    */
  val setops: String =
    """WITH y95 AS (SELECT o_custkey AS c FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
       y96 AS (SELECT o_custkey AS c FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
       ib AS (SELECT c FROM y95 INTERSECT ALL SELECT c FROM y96),
       eb AS (SELECT c FROM y95 EXCEPT ALL SELECT c FROM y96)
       SELECT op, n_rows, n_custs, key_sum FROM (
         SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c) AS BIGINT) AS n_custs,
           CAST(SUM(c) AS BIGINT) AS key_sum FROM ib
         UNION ALL
         SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c) AS BIGINT) AS n_custs,
           CAST(SUM(c) AS BIGINT) AS key_sum FROM eb)
       ORDER BY op"""

  /** Named WINDOW clause through the frontend: two shared window
    * definitions (the per-customer order sequence, and the same order
    * with an explicit cumulative frame) referenced by four window
    * functions — the reuse feature that keeps real reporting SQL
    * readable, and a parser surface distinct from inline OVER specs.
    * Dual-dialect: both engines accept standard `WINDOW name AS (...)`
    * after FROM/WHERE. The epilogue keeps each customer's LAST order row
    * (rank == partition count) so the cumulative sum is hash-visible as
    * lifetime cents, then takes a tie-broken top 10.
    */
  val namedWindow: String =
    """WITH seq AS (SELECT o_custkey AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER w AS rn,
         LAG(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
           AS prev_cents,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wcum
           AS BIGINT) AS run_cents,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey),
         wcum AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       SELECT c, CAST(n AS BIGINT) AS n_orders, run_cents AS life_cents,
         cents AS last_cents, COALESCE(prev_cents, 0) AS prev_cents
       FROM seq WHERE rn = n
       ORDER BY life_cents DESC, c LIMIT 10"""

  /** GROUPING SETS + GROUPING() through the frontend: one aggregate
    * producing the (priority × status) cells, both one-dimension rollups
    * and the grand total, with the GROUPING bitmask making each row's
    * grain explicit — the reporting-cube surface that would otherwise be
    * four UNION'd scans. Dual-dialect: standard syntax in both engines;
    * GROUPING() return types differ (Spark tinyint, DuckDB bigint) so
    * the mask is CAST. NULL group keys are COALESCE'd to 'ALL' to keep
    * the ORDER BY total across engines' NULL-ordering defaults.
    */
  val groupingSets: String =
    """WITH o AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       FROM orders)
       SELECT COALESCE(pri, 'ALL') AS pri, COALESCE(st, 'ALL') AS st,
         CAST(GROUPING(pri) AS BIGINT) * 2 + CAST(GROUPING(st) AS BIGINT)
           AS gid,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS cents
       FROM o
       GROUP BY GROUPING SETS ((pri, st), (pri), (st), ())
       ORDER BY gid, pri, st"""

  /** name -> text, for registration loops and the SQL-parity suite. */
  val all: Map[String, String] = Map(
    "q_sql_q1" -> q1, "q_sql_q2" -> q2, "q_sql_q3" -> q3, "q_sql_q4" -> q4,
    "q_sql_q7" -> q7,
    "q_sql_q8" -> q8, "q_sql_q9" -> q9, "q_sql_q11" -> q11,
    "q_sql_q12" -> q12, "q_sql_q13" -> q13, "q_sql_q15" -> q15,
    "q_sql_q16" -> q16, "q_sql_q17" -> q17, "q_sql_q20" -> q20,
    "q_sql_q21" -> q21, "q_sql_recursive" -> recursive,
    "q_sql_setops" -> setops, "q_sql_named_window" -> namedWindow,
    "q_sql_grouping" -> groupingSets)
}

package graft

import graft.ops.{Analytics, Events, Stats}

import org.apache.spark.sql.functions._

/** Round-4 additions: robust statistics (IQR fences, winsorized mean,
  * Spearman, categorical mode), gaps-and-islands streaks, HHI
  * concentration, CDC snapshot diff, sweep-line concurrency, and rate
  * limiting. Each test recomputes the operator's semantics independently
  * (driver-side brute force over the small sf0.001 fixture) and compares
  * exactly — the DuckDB oracle covers engine-vs-engine, these cover
  * the-math-is-what-we-claim.
  */
class RobustStatsSpec extends SparkSuite {
  import spark.implicits._

  /** pandas/Spark/DuckDB-convention linear-interpolation percentile. */
  private def pctl(sorted: Vector[Double], f: Double): Double = {
    val idx = f * (sorted.size - 1)
    val lo = idx.toInt
    val frac = idx - lo
    if (lo + 1 >= sorted.size) sorted(lo)
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  test("anomaly IQR: fences and outlier counts match a brute-force recompute") {
    val out = Stats.qAnomalyIqr(tables).collect()
    assert(out.length == 5)
    val byRegion = tables.orders
      .join(tables.customer, col("o_custkey") === col("c_custkey"))
      .join(tables.nation, col("c_nationkey") === col("n_nationkey"))
      .join(tables.region, col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("o_totalprice"))
      .as[(String, Double)].collect().groupBy(_._1)
    out.foreach { r =>
      val vals = byRegion(r.getString(0)).map(_._2).sorted.toVector
      val q1 = BigDecimal(pctl(vals, 0.25)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val q3 = BigDecimal(pctl(vals, 0.75)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val lo = q1 - BigDecimal("1.5") * (q3 - q1)
      val hi = q3 + BigDecimal("1.5") * (q3 - q1)
      val nOut = vals.count(v => BigDecimal(v).setScale(4,
        BigDecimal.RoundingMode.HALF_UP) < lo ||
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) > hi)
      assert(r.getDouble(1) == q1.toDouble && r.getDouble(2) == q3.toDouble)
      assert(r.getDouble(3) == lo.toDouble && r.getDouble(4) == hi.toDouble)
      assert(r.getLong(5) == vals.size && r.getLong(6) == nOut)
    }
  }

  test("winsorized mean lies within [p05, p95] and differs from raw on tails") {
    Stats.qWinsorize(tables).collect().foreach { r =>
      val (p05, p95) = (r.getDouble(1), r.getDouble(2))
      val mw = r.getDouble(5)
      assert(mw >= p05 && mw <= p95)
      // clamping can only pull the mean toward the band
      assert(math.abs(mw - r.getDouble(4)) < (p95 - p05))
    }
  }

  test("spearman: matches a driver-side recompute with average ranks") {
    val out = Stats.qSpearman(tables).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val daily = tables.lineitem
      .groupBy(col("l_returnflag"), to_date(col("l_shipdate")))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("x"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("y"))
      .select(col("l_returnflag"),
        col("x").cast("double"), col("y").cast("double"))
      .as[(String, Double, Double)].collect().groupBy(_._1)
    def avgRanks(v: Seq[Double]): Map[Double, Double] = {
      val sorted = v.sorted.zipWithIndex.map { case (x, i) => (x, i + 1.0) }
      sorted.groupBy(_._1).map { case (x, g) =>
        x -> g.map(_._2).sum / g.size
      }
    }
    daily.foreach { case (rf, rows) =>
      val xs = rows.map(_._2).toSeq
      val ys = rows.map(_._3).toSeq
      val rx = avgRanks(xs); val ry = avgRanks(ys)
      val px = xs.map(rx); val py = ys.map(ry)
      val n = px.size.toDouble
      val (sx, sy) = (px.sum, py.sum)
      val sxy = px.zip(py).map { case (a, b) => a * b }.sum
      val sxx = px.map(a => a * a).sum
      val syy = py.map(a => a * a).sum
      val rho = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(out(rf) - rho) < 1e-6, s"$rf: ${out(rf)} vs $rho")
      assert(out(rf) >= -1.0 && out(rf) <= 1.0)
    }
  }

  test("EMD drift matches a driver-side CDF-area recompute") {
    import org.apache.spark.sql.functions._
    val got = graft.ext.TextAnalysis.qEmdDrift(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val raw = tables.documents
      .select(col("source"), floor(col("n_chars") / 25.0).cast("long").as("b"))
      .as[(String, Long)].collect()
    val support = raw.map(_._2).distinct.sorted
    val allN = raw.length.toLong
    val corpusCum = support.map(b => b -> raw.count(_._2 <= b).toLong).toMap
    raw.groupBy(_._1).foreach { case (src, rows) =>
      val n = rows.length.toLong
      var num = 0L
      support.zip(support.tail).foreach { case (b, nxt) =>
        val cSrc = rows.count(_._2 <= b).toLong
        num += math.abs(cSrc * allN - corpusCum(b) * n) * (nxt - b)
      }
      val (gn, gnum, gbins) = got(src)
      assert(gn == n && gnum == num, s"$src: ($gn,$gnum) != ($n,$num)")
      assert(gbins == num.toDouble / (n * allN))
    }
  }

  test("markov attribution: removal never raises conversion; effects reconcile") {
    val rows = Events.qMarkovAttribution(tables).collect()
    assert(rows.nonEmpty)
    val base = rows.head.getLong(1)
    assert(base > 0L)
    rows.foreach { r =>
      assert(r.getLong(1) == base)
      val cv = r.getLong(2)
      // dropping a channel only removes probability mass (floors are
      // monotone), so conversion cannot rise
      assert(cv <= base, s"${r.getString(0)}: $cv > $base")
      assert(r.getDouble(3) == (base - cv).toDouble / base)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val channels = rows.map(_.getString(0)).toSeq
    assert(channels == channels.sorted && !channels.contains("purchase"))
  }

  test("shapley attribution: efficiency holds as an exact integer identity") {
    val rows = Events.qShapleyAttribution(tables).collect()
    assert(rows.length == 4)
    val vFull = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == vFull)
      assert(r.getDouble(3) == r.getLong(2).toDouble / 24.0)
    }
    // efficiency: credits sum EXACTLY (in 24ths) to v(all) - v(none)
    val (pMicro, channels) = Events.journeyChain(tables)
    val vNone = Events.absorptionMicro(pMicro, channels.toSet, rounds = 8)
    val sumNum = rows.map(_.getLong(2)).sum
    assert(sumNum == 24L * (vFull - vNone), s"$sumNum != 24*($vFull-$vNone)")
  }

  test("cohen's kappa reconciles against marginal counts; po bounds hold") {
    val rows = Stats.qCohensKappa(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, agree, po) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(agree >= 0 && agree <= n)
      assert(po == agree.toDouble / n)
      if (!r.isNullAt(4)) {
        val kappa = r.getDouble(4)
        // kappa <= po always; >= -1 by construction
        assert(kappa <= po + 1e-12 && kappa >= -1.0 - 1e-12)
      }
    }
  }

  test("k-anonymity audit: violations monotone in k, exposure consistent") {
    val rows = graft.ext.Sampling.qKAnonymity(tables).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L, 25L))
    val nRows = rows.head.getLong(4)
    val minClass = rows.head.getLong(6)
    rows.foreach { r =>
      assert(r.getLong(4) == nRows && r.getLong(6) == minClass)
      assert(r.getDouble(5) == r.getLong(3).toDouble / nRows)
      assert(r.getLong(2) <= r.getLong(1)) // violating <= classes
      // every class smaller than min_class is impossible
      if (r.getLong(0) <= minClass) assert(r.getLong(2) == 0L)
    }
    val viol = rows.map(_.getLong(2))
    assert(viol.zip(viol.tail).forall { case (a, b) => a <= b })
    val risk = rows.map(_.getLong(3))
    assert(risk.zip(risk.tail).forall { case (a, b) => a <= b })
  }

  test("mode: winner is the max-count category with lexicographic tiebreak") {
    val out = Stats.qModeCategory(tables).collect()
    val counts = tables.orders
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long"),
        col("o_orderpriority"))
      .as[(String, Long, String)].collect()
      .groupBy(t => (t._1, t._2))
    out.foreach { r =>
      val grp = counts((r.getString(0), r.getLong(1)))
      val byPrio = grp.groupBy(_._3).view.mapValues(_.size).toMap
      val best = byPrio.toSeq.sortBy { case (p, n) => (-n, p) }.head
      assert(r.getString(2) == best._1 && r.getLong(3) == best._2)
      assert(r.getDouble(4) == best._2.toDouble / grp.size)
    }
  }

  test("ship streaks: gaps-and-islands matches per-supplier brute force") {
    val out = Analytics.qShipStreaks(tables).collect()
    val days = tables.lineitem
      .select(col("l_suppkey"), to_date(col("l_shipdate")).cast("string"))
      .distinct()
      .as[(Long, String)].collect().groupBy(_._1)
    out.foreach { r =>
      val ds = days(r.getLong(0)).map(d =>
        java.time.LocalDate.parse(d._2).toEpochDay).sorted
      // linear scan for consecutive-day run lengths
      var lens = List.empty[Int]; var cur = 0; var prev = Long.MinValue
      ds.foreach { d =>
        if (d == prev + 1) cur += 1 else { if (cur > 0) lens ::= cur; cur = 1 }
        prev = d
      }
      if (cur > 0) lens ::= cur
      assert(r.getLong(1) == lens.max.toLong, s"supplier ${r.getLong(0)}")
      assert(r.getLong(2) == lens.size.toLong)
      assert(r.getLong(3) == ds.size.toLong)
    }
  }

  test("HHI: bounded by [10000/n, 10000] and equals the share-squared sum") {
    Analytics.qHhiConcentration(tables).collect().foreach { r =>
      val n = r.getLong(1).toDouble
      val hhi = r.getDouble(3)
      assert(hhi >= 10000.0 / n - 1e-6 && hhi <= 10000.0 + 1e-6)
    }
  }

  test("snapshot diff: class counts match the simulated churn rules") {
    val out = Analytics.qSnapshotDiff(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val orders = tables.orders
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_orderdate") < lit("2000-01-01")).as("isOld"))
      .as[(Long, Double, Boolean)].collect()
    def inNew(k: Long) = k % 101 != 0
    val added = orders.count(o => !o._3 && inNew(o._1))
    val removed = orders.count(o => o._3 && !inNew(o._1))
    val changed = orders.count(o => o._3 && inNew(o._1) && o._1 % 7 == 0)
    val unchanged = orders.count(o => o._3 && inNew(o._1) && o._1 % 7 != 0)
    assert(out("added")._1 == added)
    assert(out("removed")._1 == removed)
    assert(out("changed")._1 == changed)
    assert(out("unchanged")._1 == unchanged)
    assert(out("unchanged")._2 == 0.0)       // identical rows net to zero
    assert(out("removed")._2 < 0.0)          // deletions subtract value
    // changed rows are +10% uplifts: delta == 0.1 * sum(old price), exactly
    val expectChanged = orders.filter(o => o._3 && inNew(o._1) && o._1 % 7 == 0)
      .map(o => BigDecimal(o._2).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal("0.1"))
      .foldLeft(BigDecimal(0))(_ + _)
    assert(math.abs(out("changed")._2 - expectChanged.toDouble) < 1e-6)
  }

  test("session concurrency: sweep matches a brute-force interval count") {
    val out = Events.qSessionConcurrency(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evs = tables.events.select(expr("ts_ns div 1000"), col("event_id"))
      .as[(Long, Long)].collect()
    val active = 300L * 1000000L
    // boundaries in sweep order: (t, delta, event_id), ends before starts
    val pts = (evs.map(e => (e._1, 1, e._2)) ++
      evs.map(e => (e._1 + active, -1, e._2)))
      .sortBy(p => (p._1, p._2, p._3))
    var live = 0L
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    pts.foreach { case (t, d, _) =>
      live += d
      val hod = (t / 3600000000L) % 24
      peaks(hod) = math.max(peaks.getOrElse(hod, Long.MinValue), live)
    }
    assert(live == 0L)                        // every interval closed
    peaks.foreach { case (hod, p) => assert(out(hod) == p, s"hod $hod") }
  }

  test("centroid similarity: bounded, complete pair set, matches HOF cosine") {
    val out = graft.ext.Similarity.qCentroidSim(tables).collect()
    val nLabels = tables.embeddings.select("label").distinct().count()
    assert(out.length == (nLabels * (nLabels - 1) / 2).toInt)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("interarrival: mean within [min, max] gap; p50 <= p95") {
    Events.qInterarrival(tables).collect().foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) <= r.getDouble(4))     // p50 <= p95
      assert(r.getDouble(2) > 0)                   // time moves forward
    }
  }

  test("zipf slope is negative (frequency decreasing in rank)") {
    val r = graft.ext.TextAnalysis.qZipfSlope(tables).head()
    assert(r.getLong(0) > 10)
    assert(r.getDouble(1) < 0.0, s"slope ${r.getDouble(1)}")
  }

  test("charset stats reconcile against a driver-side recompute") {
    val out = graft.ext.TextAnalysis.qCharsetStats(tables).collect()
    val docs = tables.documents.select(col("lang"), col("text"))
      .as[(String, String)].collect().groupBy(_._1)
    out.foreach { r =>
      val texts = docs(r.getString(0)).map(_._2)
      val extra = texts.map(t =>
        t.getBytes("UTF-8").length.toLong - t.codePointCount(0, t.length))
      assert(r.getLong(1) == texts.length)
      assert(r.getLong(2) == extra.count(_ > 0))
      assert(r.getLong(3) == extra.sum)
    }
  }

  test("incremental aggregate merge equals the direct full rollup") {
    val merged = Analytics.qIncrAgg(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val direct = tables.orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(merged == direct)
  }

  test("embedding outliers: max >= mean of top-k; ascending isolation order") {
    val out = graft.ext.Similarity.qEmbedOutliers(tables).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(2) - 1e-9) // max >= mean(top-k)
      assert(r.getDouble(1) <= 1.0 + 1e-9)
    }
    val maxes = out.map(_.getDouble(1)).toSeq
    assert(maxes == maxes.sorted, "rows must order by ascending isolation")
  }

  test("association rules: measures reconcile against brute-force basket counts") {
    val out = Analytics.qAssocRules(tables).collect()
    assert(out.nonEmpty)
    val items = tables.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val nBaskets = items.map(_._1).distinct.length
    val itemN = items.groupBy(_._2).view.mapValues(_.length).toMap
    val pairN = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    out.foreach { r =>
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == pairN((p1, p2)).toLong)
      assert(r.getLong(3) == itemN(p1).toLong && r.getLong(4) == itemN(p2).toLong)
      assert(r.getDouble(5) ==
        pairN((p1, p2)).toDouble / itemN(p1).toDouble)
      assert(r.getDouble(6) ==
        (nBaskets.toLong * pairN((p1, p2))).toDouble /
          (itemN(p1).toLong * itemN(p2)).toDouble)
    }
  }

  test("forecast backtest: seasonal-naive errors reconcile per type") {
    val out = Events.qForecastBacktest(tables).collect()
    val hourly = tables.events
      .select(col("event_type"), expr("(ts_ns div 1000) div 3600000000"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val et = r.getString(0)
      // .toSeq FIRST: collect on a Map would rebuild a Map keyed by the
      // first tuple element, silently deduplicating equal actuals
      val pairs = hourly.toSeq.collect {
        case ((t, hr), n) if t == et && hourly.contains((et, hr - 24)) =>
          (n, hourly((et, hr - 24)))
      }
      assert(r.getLong(1) == pairs.size.toLong)
      val mae = pairs.map { case (a, p) => math.abs(a - p) }.sum.toDouble / pairs.size
      assert(r.getDouble(2) == mae)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("rate limit: at most 2 kept per (user, minute); totals reconcile") {
    val out = Events.qRateLimit(tables).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
    val evs = tables.events
      .select(col("user_id"), expr("(ts_ns div 1000) div 60000000"))
      .as[(Long, Long)].collect()
    val expectKept = evs.groupBy(identity).map { case (_, g) =>
      math.min(g.size, 2)
    }.sum
    assert(out.map(_.getLong(2)).sum == expectKept)
    assert(out.map(_.getLong(1)).sum == evs.length)
  }
}

package graft

import graft.ext.TextAnalysis
import graft.ops.{Events, Graph, Stats}

/** Round-5 wave: robust trend tests, association effect size, lexical
  * diversity, traffic-shape and seasonality gauges, and degree-weighted
  * link scoring. Each test recomputes the operator's claim driver-side
  * from first principles over sf0.001; the DuckDB oracle covers
  * engine-vs-engine equality separately.
  */
class TrendStatsSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  /** (segment, month index) -> revenue cents, the shared series. */
  private lazy val monthly: Map[String, Seq[(Long, BigInt)]] = {
    val rows = tables.orders
      .join(tables.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        ((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
          .cast("long"),
        (col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).map { case (seg, rs) =>
      seg -> rs.groupBy(_._2).map { case (x, es) =>
        x -> es.map(e => BigInt(e._3)).sum
      }.toSeq.sortBy(_._1)
    }
  }

  test("mann-kendall S and variance match a brute-force pair scan") {
    val got = Stats.qMannKendall(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val series = monthly(r.getString(0)).map(_._2)
      val n = series.size
      var s = 0L
      for (i <- series.indices; j <- i + 1 until n)
        s += series(j).compare(series(i)).sign
      val ties = series.groupBy(identity).values.map(_.size.toLong)
      val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieTerm) / 18.0
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == s)
      assert(math.abs(r.getDouble(3) - varS) < 1e-9)
      val z =
        if (s > 0) (s - 1) / math.sqrt(varS)
        else if (s < 0) (s + 1) / math.sqrt(varS)
        else 0.0
      assert(math.abs(r.getDouble(4) - z) < 1e-9)
    }
  }

  test("theil-sen slope is the median pairwise slope") {
    val got = Stats.qTheilSen(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val series = monthly(r.getString(0))
      val slopes = (for {
        i <- series.indices; j <- i + 1 until series.size
      } yield (series(j)._2 - series(i)._2).toDouble / 100.0 /
        (series(j)._1 - series(i)._1).toDouble).sorted
      val np = slopes.size
      assert(r.getLong(1) == np)
      // both in dollars/month (the engine's rev is a DECIMAL dollar sum)
      val med = (slopes((np - 1) / 2) + slopes(np / 2)) / 2.0
      assert(math.abs(r.getDouble(2) - med) < 1e-6)
    }
  }

  test("cramers v matches a driver-side contingency recompute") {
    val docs = tables.documents.select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toDouble
    val langs = docs.map(_._1).distinct.sorted
    val srcs = docs.map(_._2).distinct.sorted
    val chi2 = (for { l <- langs; s <- srcs } yield {
      val o = docs.count(d => d == (l, s)).toDouble
      val e = docs.count(_._1 == l) * docs.count(_._2 == s) / n
      BigDecimal(math.round((o - e) * (o - e) / e * 1e9)) / BigDecimal(1e9)
    }).sum.toDouble
    val r = Stats.qCramersV(tables).collect().head
    assert(r.getLong(0) == docs.length)
    assert(r.getLong(1) == langs.size * srcs.size)
    assert(r.getLong(2) == (langs.size - 1) * (srcs.size - 1))
    assert(math.abs(r.getDouble(3) - chi2) < 1e-6)
    val v = math.sqrt(chi2 / (n * math.min(langs.size - 1, srcs.size - 1)))
    assert(math.abs(r.getDouble(4) - v) < 1e-9)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("burstiness matches per-user gap moments; bounds hold") {
    val evs = tables.events.select("user_id", "ts_ns", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000, r.getLong(2)))
    val byUser = evs.groupBy(_._1).map { case (u, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      u -> ts.zip(ts.tail).map { case (a, b) => b - a }
    }
    val got = Events.qBurstiness(tables).collect()
    val expected = byUser.filter(_._2.size >= 20)
    assert(got.length == expected.size)
    got.foreach { r =>
      val gaps = byUser(r.getLong(0))
      val n = gaps.size
      assert(r.getLong(1) == n)
      val mean = gaps.sum.toDouble / n
      val sd = math.sqrt(
        gaps.map(g => (g - mean) * (g - mean)).sum / n)
      assert(math.abs(r.getDouble(2) - mean / 1e6) < 1e-6)
      assert(math.abs(r.getDouble(3) - sd / 1e6) < 1e-4)
      val b = r.getDouble(4)
      assert(b > -1.0 && b < 1.0)
      assert(math.abs(b - (sd - mean) / (sd + mean)) < 1e-6)
    }
  }

  test("seasonal strength is a valid variance decomposition") {
    val evs = tables.events
      .select(col("event_type"), expr("(ts_ns div 3600000000000) % 24"),
        (col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Events.qSeasonalStrength(tables).collect()
    got.foreach { r =>
      val es = evs.filter(_._1 == r.getString(0))
      val cents = es.map(_._3.toDouble)
      val n = cents.size
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == es.map(_._2).distinct.size)
      val mean = cents.sum / n
      val ssTotal = cents.map(c => (c - mean) * (c - mean)).sum / 1e4
      val ssWithin = es.groupBy(_._2).values.map { hs =>
        val h = hs.map(_._3.toDouble)
        val hm = h.sum / h.size
        h.map(c => (c - hm) * (c - hm)).sum / 1e4
      }.sum
      assert(math.abs(r.getDouble(3) - ssTotal) < math.abs(ssTotal) * 1e-6 + 1)
      assert(math.abs(r.getDouble(4) - ssWithin) <
        math.abs(ssWithin) * 1e-6 + 1)
      // within-group SS can never exceed total SS
      assert(r.getDouble(5) >= -1e-9 && r.getDouble(5) <= 1.0)
    }
  }

  test("ttr curve: pooled type/token sums match per-doc array counts") {
    val docs = tables.documents.select("lang", "text").collect()
      .map { r =>
        val w = r.getString(1).trim.toLowerCase.split(" +")
        (r.getString(0), (w.length - 1) / 16, w.length.toLong,
          w.distinct.length.toLong)
      }
    val got = TextAnalysis.qTtrCurve(tables).collect()
    val exp = docs.groupBy(d => (d._1, d._2))
    assert(got.length == exp.size)
    got.foreach { r =>
      val ds = exp((r.getString(0), r.getLong(1).toInt))
      assert(r.getLong(2) == ds.size)
      assert(r.getLong(3) == ds.map(_._3).sum)
      assert(r.getLong(4) == ds.map(_._4).sum)
      assert(math.abs(r.getDouble(5) -
        ds.map(_._4).sum.toDouble / ds.map(_._3).sum) < 1e-12)
      // TTR is a ratio of types to tokens: (0, 1]
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  /** Symmetric distinct co-purchase adjacency at sf0.001. */
  private lazy val adj: Map[Long, Set[Long]] = {
    val baskets = tables.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).toSet)
    val edges = baskets.flatMap(b =>
      for (a <- b; c <- b if a != c) yield (a, c)).toSet
    edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
  }

  test("clustering coefficient matches brute-force per-node triangles") {
    val got = graft.ops.Graph.qClusteringCoeff(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val node = r.getLong(0)
      val nbrs = adj(node)
      assert(r.getLong(1) == nbrs.size)
      val tri = nbrs.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      assert(r.getLong(2) == tri)
      if (nbrs.size >= 2)
        assert(math.abs(r.getDouble(3) -
          2.0 * tri / (nbrs.size.toLong * (nbrs.size - 1))) < 1e-12)
    }
    // top-25 cut is by triangle count: verify non-increasing
    val ts = got.map(_.getLong(2)).toSeq
    assert(ts == ts.sorted.reverse)
  }

  test("assortativity matches a driver-side Pearson over edge degrees") {
    val pairs = adj.toSeq.flatMap { case (u, ns) =>
      ns.toSeq.map(v => (adj(u).size.toLong, adj(v).size.toLong))
    }
    val n = pairs.size.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sy = pairs.map(_._2).sum.toDouble
    val sxx = pairs.map(p => p._1.toDouble * p._1).sum
    val syy = pairs.map(p => p._2.toDouble * p._2).sum
    val sxy = pairs.map(p => p._1.toDouble * p._2).sum
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = graft.ops.Graph.qAssortativity(tables).collect().head
    assert(got.getLong(0) == pairs.size)
    assert(math.abs(got.getDouble(1) - sx / n) < 1e-9)
    assert(math.abs(got.getDouble(2) - r) < 1e-6)
    assert(got.getDouble(2) >= -1.0 && got.getDouble(2) <= 1.0)
  }

  test("srm audit: chi2 matches a bucket recompute; uniform split passes") {
    val users = tables.events.select("user_id").distinct().collect()
      .map(_.getLong(0))
    val got = graft.ops.Events.qAbSrm(tables).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 3L, 5L))
    got.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == users.length)
      val e = users.length.toDouble / k
      val chi2 = (0L until k).map { b =>
        val o = users.count(_ % k == b).toDouble
        (o - e) * (o - e) / e
      }.sum
      assert(math.abs(r.getDouble(2) - chi2) < 1e-6)
      // sequential synthetic user ids are near-perfectly uniform mod k
      assert(r.getLong(4) == 0L)
    }
  }

  test("silhouette: bounds hold and a/b match a driver-side recompute") {
    val rows = tables.embeddings.collect().map { r =>
      (r.getLong(0), r.getInt(2).toLong,
        r.getSeq[Float](1).map(x => math.floor(x * 1000.0 + 0.5).toLong))
    }
    val byLabel = rows.groupBy(_._2)
    val cents = byLabel.map { case (l, rs) =>
      val dims = rs.head._3.indices
      l -> (rs.size.toLong, dims.map(d => rs.map(_._3(d)).sum).toVector)
    }
    def dist(m: Seq[Long], l: Long): Double = {
      val (nl, s) = cents(l)
      math.sqrt(
        m.indices.map { d =>
          val diff = m(d) * nl - s(d); diff.toDouble * diff
        }.sum) / (nl * 1000.0)
    }
    val perLabel = rows.groupBy(_._2).map { case (l, rs) =>
      val sils = rs.map { case (_, own, m) =>
        val a = dist(m, own)
        val b = cents.keys.filter(_ != own).map(dist(m, _)).min
        if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      }
      l -> sils.map(s => math.round(s * 1e9) / 1e9).sum / rs.size
    }
    val got = graft.ext.Similarity.qSilhouette(tables).collect()
    assert(got.length == byLabel.size)
    got.foreach { r =>
      assert(r.getLong(1) == byLabel(r.getLong(0)).size)
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      assert(math.abs(r.getDouble(2) - perLabel(r.getLong(0))) < 1e-6)
      assert(r.getDouble(3) > 0.0 && r.getDouble(4) > 0.0)
    }
  }

  test("hill tail estimator matches a driver-side top-k recompute") {
    val cents = tables.orders
      .select((col("o_totalprice").cast(
        org.apache.spark.sql.types.DecimalType(18, 2)) * 100).cast("long"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, k) => (-c, k) }
    val top = cents.take(201)
    val xk1 = top.last._1
    val hill = top.take(200)
      .map(p => math.round(math.log(p._1.toDouble / xk1) * 1e9) / 1e9)
      .sum / 200.0
    val r = graft.ops.Stats.qHillTail(tables).collect().head
    assert(r.getLong(0) == 200L)
    assert(math.abs(r.getDouble(1) - xk1 / 100.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - hill) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0 / hill) < 1e-6)
    assert(r.getDouble(2) > 0.0)
  }

  test("difference-in-differences nets out the shared trend") {
    val dayNs = 86400L * 1000000000L
    val evs = tables.events
      .select("user_id", "ts_ns", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1) / dayNs, r.getString(2),
        r.getDouble(3)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max + 1) / 2
    def cell(v: Long, pre: Boolean): (Long, Double) = {
      val us = evs.filter(_._1 % 2 == v).map(_._1).distinct
      val s = evs.filter(e => e._1 % 2 == v && e._3 == "purchase" &&
        ((e._2 < mid) == pre)).map(e => math.round(e._4 * 1e6)).sum
      (us.size.toLong, s.toDouble / 1e6 / us.size)
    }
    val got = graft.ops.Events.qDid(tables).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val deltas = got.map(r => r.getLong(0) -> (r.getDouble(3) - r.getDouble(2))).toMap
    got.foreach { r =>
      val v = r.getLong(0)
      val (n, mpre) = cell(v, pre = true)
      val (_, mpost) = cell(v, pre = false)
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - mpre) < 1e-6)
      assert(math.abs(r.getDouble(3) - mpost) < 1e-6)
      assert(math.abs(r.getDouble(5) - (deltas(1L) - deltas(0L))) < 1e-9)
    }
  }

  test("dominant period: acf matches a brute-force recompute per type") {
    val hourNs = 3600L * 1000000000L
    val evs = tables.events.select("event_type", "ts_ns").collect()
      .map(r => (r.getString(0), r.getLong(1) / hourNs))
    val got = graft.ops.Events.qDominantPeriod(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val hs = evs.filter(_._1 == r.getString(0)).map(_._2)
      val counts = hs.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
      val (h0, h1) = (hs.min, hs.max)
      val xs = (h0 to h1).map(h => counts.getOrElse(h, 0L)).toArray
      val n = xs.length.toLong
      assert(r.getLong(1) == n)
      val s = xs.sum
      val d = xs.map(x => BigInt(x * n - s))
      val den = d.map(v => v * v).sum
      val acf = (2 to 48).map { l =>
        val num = (0 until xs.length - l).map(i => d(i) * d(i + l)).sum
        l -> math.round(num.toDouble / den.toDouble * 1e9) / 1e9
      }
      val (bestLag, bestR) = acf.minBy { case (l, v) => (-v, l) }
      assert(r.getLong(2) == bestLag)
      assert(math.abs(r.getDouble(3) - bestR) < 1e-9)
      assert(math.abs(r.getDouble(4) - acf.toMap.apply(24)) < 1e-9)
    }
  }

  test("tokenizer fertility: subword/word ratio per language") {
    val docs = tables.documents.select("lang", "text").collect()
      .map { r =>
        val text = r.getString(1)
        val ws = if (text.trim.isEmpty) 0L else text.trim.split(" +").length.toLong
        val bpe = "[aeiou]+|[^aeiou ]+".r.findAllIn(text).size.toLong
        (r.getString(0), ws, bpe)
      }
    val got = graft.ext.TextAnalysis.qTokenizerFertility(tables).collect()
    assert(got.length == docs.map(_._1).distinct.length)
    got.foreach { r =>
      val ds = docs.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == ds.length)
      assert(r.getLong(2) == ds.map(_._2).sum)
      assert(r.getLong(3) == ds.map(_._3).sum)
      // subword segmentation can only split words, never merge them
      assert(r.getDouble(4) >= 1.0)
    }
  }

  test("conversion window matches a per-click next-purchase recompute") {
    val evs = tables.events
      .select("user_id", "event_id", "event_type", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3) / 1000))
    val byUser = evs.groupBy(_._1)
    val clicks = evs.filter(_._3 == "click").map { c =>
      val later = byUser(c._1).filter(e =>
        e._3 == "purchase" &&
          (e._4 > c._4 || (e._4 == c._4 && e._2 > c._2)))
      val lat = if (later.isEmpty) None else Some(later.map(_._4).min - c._4)
      lat.filter(_ <= 3600000000L)
    }
    val lats = clicks.flatten.sorted
    val r = graft.ops.Events.qConversionWindow(tables).collect().head
    assert(r.getLong(0) == clicks.length)
    assert(r.getLong(1) == lats.length)
    assert(math.abs(r.getDouble(2) -
      lats.length.toDouble / clicks.length) < 1e-12)
    assert(math.abs(r.getDouble(3) -
      lats.map(BigInt(_)).sum.toDouble / lats.length / 1e6) < 1e-6)
    // exact-percentile median with linear interpolation
    val n = lats.length
    val med =
      if (n % 2 == 1) lats(n / 2).toDouble
      else (lats(n / 2 - 1) + lats(n / 2)) / 2.0
    assert(math.abs(r.getDouble(4) - med / 1e6) < 1e-6)
  }

  test("dup-size histogram partitions the corpus exactly") {
    val prefixes = tables.documents.select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split(" +").take(12).mkString(" "))
    val sizes = prefixes.groupBy(identity).values.map(_.size).toSeq
    val hist = sizes.groupBy(identity).map { case (s, g) => s -> g.size }
    val got = graft.ext.Dedup.qDupSizeHist(tables).collect()
    assert(got.length == hist.size)
    var docs = 0L
    got.foreach { r =>
      assert(r.getLong(1) == hist(r.getLong(0).toInt))
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getLong(3) == (r.getLong(0) - 1) * r.getLong(1))
      docs += r.getLong(2)
    }
    // families partition the corpus: doc counts sum to the corpus size
    assert(docs == prefixes.length)
    assert(math.abs(got.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("node jaccard agrees with adjacency-set recompute") {
    val got = graft.ops.Graph.qNodeJaccard(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      assert(!adj(u).contains(v)) // candidates are non-adjacent
      val inter = (adj(u) intersect adj(v)).size
      val uni = (adj(u) union adj(v)).size
      assert(r.getLong(2) == inter)
      assert(r.getLong(3) == uni)
      assert(r.getLong(4) == 1000000000L * inter / uni)
      assert(math.abs(r.getDouble(5) - inter.toDouble / uni) < 1e-12)
    }
  }

  test("partial correlation: bounds and controlled-channel formula hold") {
    val got = graft.ops.Stats.qPartialCorr(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rxy, rxz, ryz, pr) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      Seq(rxy, rxz, ryz, pr).foreach(v => assert(v >= -1.0 && v <= 1.0))
      val expect = (rxy - rxz * ryz) /
        math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
      assert(math.abs(pr - expect) < 1e-6)
    }
  }

  test("resource allocation demotes hub-mediated candidates") {
    val ra = Graph.qResourceAlloc(tables).collect()
    assert(ra.nonEmpty)
    // per-probe: ranks are 1..k and ra_units non-increasing
    ra.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq == (1L to sorted.size).toSeq)
      assert(sorted.map(_.getLong(3)).toSeq ==
        sorted.map(_.getLong(3)).toSeq.sorted.reverse)
    }
    // RA score of a pair can never exceed 1e9 * common-neighbor count
    // (each common neighbor contributes at most 1e9/1 units)
    ra.foreach(r => assert(r.getLong(3) <= r.getLong(2) * 1000000000L))
    // cross-check n_common against qLinkPrediction on shared pairs
    val cn = Graph.qLinkPrediction(tables).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    ra.foreach { r =>
      cn.get((r.getLong(0), r.getLong(1)))
        .foreach(c => assert(c == r.getLong(2)))
    }
  }
}

package graft

import graft.ext.{Sampling, TextAnalysis}
import graft.ops.{Analytics, Events, Graph, Stats}

/** Round-5 wave 2: product-health series (stickiness, time-to-nth,
  * behavioral entropy), the ANOVA omnibus, ABC classification, HITS, the
  * Gopher rule battery, and compaction planning. Each test recomputes the
  * operator's claim driver-side from first principles over sf0.001; the
  * DuckDB oracle covers engine-vs-engine equality separately.
  */
class ProductStatsSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  private val dayNs = 86400L * 1000000000L

  /** (user, day) activity grid, driver-side. */
  private lazy val grid: Set[(Long, Long)] =
    tables.events.select(col("user_id"), expr(s"ts_ns div $dayNs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stickiness: dau/wau/mau match brute-force sliding distinct counts") {
    val got = Events.qStickiness(tables).collect()
    assert(got.nonEmpty)
    val maxDay = grid.map(_._2).max
    got.foreach { r =>
      val d = r.getLong(0)
      assert(d <= maxDay)
      def active(w: Long) =
        grid.collect { case (u, ad) if ad <= d && ad > d - w => u }.size
      assert(r.getLong(1) == active(1), s"dau day $d")
      assert(r.getLong(2) == active(7), s"wau day $d")
      assert(r.getLong(3) == active(28), s"mau day $d")
      assert(math.abs(r.getDouble(4) -
        BigDecimal(active(1).toDouble / active(28))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // every day from the first active day to the last must be present
    val days = got.map(_.getLong(0)).toSet
    assert(days.max == maxDay)
  }

  test("time-to-nth: ordinals and latencies match a driver-side replay") {
    val evs = tables.events
      .select(col("user_id"), expr("ts_ns div 1000"), col("event_type"),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val firstUs = evs.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val lats: Map[Int, Seq[Long]] = (1 to 3).map { n =>
      n -> evs.filter(_._3 == "purchase").groupBy(_._1).toSeq.flatMap {
        case (u, es) =>
          val sorted = es.sortBy(e => (e._2, e._4))
          if (sorted.size >= n) Some(sorted(n - 1)._2 - firstUs(u)) else None
      }
    }.toMap
    val got = Events.qTimeToNth(tables).collect()
    got.foreach { r =>
      val n = r.getLong(0).toInt
      val l = lats(n)
      assert(r.getLong(1) == l.size, s"n_users at n=$n")
      assert(math.abs(r.getDouble(2) -
        l.map(BigInt(_)).sum.toDouble / l.size / 1e6) < 1e-9, s"mean at n=$n")
    }
    assert(got.map(_.getLong(0)).toSeq == (1 to 3).map(_.toLong))
  }

  test("user entropy: zero for single-type users, log2(k) for uniform mixes") {
    val got = Events.qUserEntropy(tables).collect()
    assert(got.nonEmpty)
    val counts = tables.events.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (u, es) =>
        u -> es.groupBy(_._2).map(_._2.size.toLong)
      }
    got.foreach { r =>
      val cs = counts(r.getLong(0))
      val n = cs.sum.toDouble
      assert(r.getLong(1) == cs.sum)
      assert(r.getLong(2) == cs.size)
      // reference entropy WITHOUT the decimal pinning — the pinned value
      // must sit within 1e-8 of it (pinning moves ≤ n_types * 5e-10)
      val ref = -cs.map(c => c / n * (math.log(c / n) / math.log(2.0))).sum
      assert(math.abs(r.getDouble(3) - ref) < 1e-7)
      assert(r.getDouble(3) >= -1e-12 &&
        r.getDouble(3) <= math.log(cs.size.toDouble) / math.log(2.0) + 1e-7)
    }
  }

  test("anova: F and eta^2 match a two-pass driver-side computation") {
    val xs = tables.orders.select("o_orderpriority", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1) / 1000.0))
    val groups = xs.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = xs.length
    val k = groups.size
    val grand = xs.map(_._2).sum / n
    val ssb = groups.map(g => g.size * math.pow(g.sum / g.size - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.size; g.map(x => math.pow(x - m, 2)).sum }).sum
    val r = Stats.qAnova(tables).collect().head
    assert(r.getLong(0) == k && r.getLong(1) == n)
    // decimal pinning truncates at 1e-6/1e-4 — compare at relative 1e-4
    assert(math.abs(r.getDouble(2) - ssb) / ssb < 1e-3, s"ssb ${r.getDouble(2)} vs $ssb")
    assert(math.abs(r.getDouble(3) - ssw) / ssw < 1e-3, s"ssw ${r.getDouble(3)} vs $ssw")
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getDouble(4) - f) / f < 1e-2)
    assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0)
  }

  test("abc classification partitions parts at the 80/95 cumulative cuts") {
    val rev = tables.lineitem
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(24, 6))).as("rev"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1))))
    val total = rev.map(_._2).sum
    val sorted = rev.sortBy { case (pk, rv) => (-rv, pk) }
    var cum = BigDecimal(0)
    val classes = sorted.map { case (_, rv) =>
      val c = if (cum * 5 < total * 4) "A"
        else if (cum * 20 < total * 19) "B" else "C"
      cum += rv
      c
    }
    val expected = classes.groupBy(identity).map { case (c, cs) => c -> cs.size.toLong }
    val got = Analytics.qAbcClass(tables).collect()
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    val shareSum = got.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("hits: integer micro-unit rounds match a driver-side replay") {
    val li = tables.lineitem.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.toSeq.groupBy(_._1).valuesIterator.flatMap { ps =>
      val pk: List[Long] = ps.map(_._2).distinct.toList
      for (a <- pk; b <- pk if a != b) yield (a, b)
    }.toSet
    def step(in: Map[Long, Long], reverse: Boolean): Map[Long, Long] = {
      val raw = edges.toSeq
        .map { case (s, d) => if (reverse) (d, s) else (s, d) }
        .collect { case (from, to) if in.contains(from) => to -> in(from) }
        .groupBy(_._1).map { case (nd, vs) => nd -> vs.map(v => BigInt(v._2)).sum }
      val mx = raw.values.max
      raw.map { case (nd, v) => nd -> (v * 1000000 / mx).toLong }
    }
    val h0 = edges.map(_._1).map(_ -> 1000000L).toMap
    val a1 = step(h0, reverse = false)
    val h1 = step(a1, reverse = true)
    val a2 = step(h1, reverse = false)
    val expectTop = a2.toSeq.sortBy { case (nd, a) => (-a, nd) }.take(25)
    val got = Graph.qHits(tables).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      expectTop.map { case (nd, a) => (nd, a) })
    got.foreach(r => assert(r.getLong(1) == h1(r.getLong(0))))
  }

  test("gopher rules: flags recomputed per document from its text") {
    val docs = tables.documents.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val stop = Set("the", "of", "and", "to", "le", "la", "el", "de",
      "der", "die", "data", "query")
    val got = TextAnalysis.qGopherRules(tables).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val text = docs(r.getLong(0))
      val ws = text.trim.toLowerCase.split(" +", -1)
      assert(r.getLong(1) == ws.length)
      val meanWl = ws.map(_.length).sum.toDouble / ws.length
      assert(math.abs(r.getDouble(2) - meanWl) < 1e-5)
      val digitRatio = text.count(_.isDigit).toDouble / text.length
      assert(math.abs(r.getDouble(3) - digitRatio) < 1e-5)
      val nStop = ws.toSet.count(stop)
      assert(r.getLong(4) == nStop)
      assert(r.getLong(5) == (if (ws.length >= 15 && ws.length <= 90) 1 else 0))
      assert(r.getLong(7) == (if (r.getDouble(3) <= 0.2) 1 else 0))
      assert(r.getLong(8) == (if (nStop >= 2) 1 else 0))
      val all = r.getLong(5) + r.getLong(6) + r.getLong(7) + r.getLong(8)
      assert(r.getLong(9) == (if (all == 4) 1 else 0))
    }
    // the battery must discriminate: at least one pass and one fail
    assert(got.exists(_.getLong(9) == 1L) && got.exists(_.getLong(9) == 0L))
  }

  test("compaction plan: greedy byte bins respect the start-offset rule") {
    val target = 65536L
    val docs = tables.documents.select(
        col("lang"), col("doc_id"), octet_length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val assigned: Seq[((String, Long), (Long, Long))] =
      docs.toSeq.groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, id, b) =>
          val bin = cum / target
          cum += b
          ((lang, bin), (id, b))
        }
      }
    val expected: Map[(String, Long), (Long, Long, Long, Long)] =
      assigned.groupBy(_._1).map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.map(_._2._2).sum,
          vs.map(_._2._1).min, vs.map(_._2._1).max))
      }
    val got = Sampling.qCompactionPlan(tables).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected((r.getString(0), r.getLong(1)))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) == e)
    }
    // no bin except possibly the last of each lang may END below target —
    // i.e. every bin that has a successor must have crossed the boundary
    val byLang = got.groupBy(_.getString(0))
    byLang.values.foreach { bins =>
      val s = bins.sortBy(_.getLong(1))
      s.dropRight(1).zip(s.drop(1)).foreach { case (b, nxt) =>
        assert(nxt.getLong(1) >= b.getLong(1))
      }
    }
  }
}

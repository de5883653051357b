package graft

import graft.ext.TextAnalysis
import graft.ops.Events

/** Round-5 wave: experimentation / monitoring operators — SLO burn rate,
  * CUPED variance reduction, offline changepoint, and the language-ID
  * confusion audit. Each test recomputes the operator's claim driver-side
  * from first principles over sf0.001 (brute force where the engine uses
  * prefix sums); the DuckDB oracle covers engine-vs-engine equality
  * separately.
  */
class ExperimentOpsSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  private val dayNs = 86400L * 1000000000L

  private lazy val events: Seq[(Long, Long, String, Double)] =
    tables.events.select("ts_ns", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSeq

  test("slo burn matches a driver-side recompute (range window semantics)") {
    val byDay = events.groupBy(_._1 / dayNs).map { case (d, es) =>
      d -> (es.size.toLong, es.count(_._3 == "error").toLong)
    }
    val got = Events.qSloBurn(tables).collect()
    assert(got.length == byDay.size)
    val days = byDay.keys.toSeq.sorted
    got.zip(days).foreach { case (r, d) =>
      val (tot, err) = byDay(d)
      assert(r.getLong(1) == tot && r.getLong(2) == err)
      // 7-day window is RANGE over the day index: absent days contribute
      // nothing but still shrink the window
      val win = days.filter(x => x >= d - 6 && x <= d)
      val (t7, e7) = (win.map(byDay(_)._1).sum, win.map(byDay(_)._2).sum)
      assert(math.abs(r.getDouble(3) - 4.0 * err / tot) < 1e-6)
      assert(math.abs(r.getDouble(4) - 4.0 * e7 / t7) < 1e-6)
    }
  }

  test("cuped adjustment matches a driver-side recompute") {
    val dayIdx = events.map(_._1 / dayNs)
    val mid = (dayIdx.min + dayIdx.max + 1) / 2
    val perUser = events.groupBy(_._2).map { case (u, es) =>
      def s(pre: Boolean) = es
        .filter(e => e._3 == "purchase" && ((e._1 / dayNs < mid) == pre))
        .map(e => math.round(e._4 * 1e6)).sum
      u -> (s(pre = true), s(pre = false))
    }
    val n = perUser.size.toLong
    val xs = perUser.values.map(_._1).toSeq
    val ys = perUser.values.map(_._2).toSeq
    val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
    val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val theta = (BigInt(n) * sxy - sx * sy).toDouble /
      (BigInt(n) * sxx - sx * sx).toDouble
    val meanPreAll = sx.toDouble / 1e6 / n
    val got = Events.qCuped(tables).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(got.map(_.getLong(1)).sum == n)
    got.foreach { r =>
      val vs = perUser.filter(_._1 % 2 == r.getLong(0))
      val nv = vs.size
      val meanPre = vs.values.map(_._1).sum.toDouble / 1e6 / nv
      val meanPost = vs.values.map(_._2).sum.toDouble / 1e6 / nv
      assert(r.getLong(1) == nv)
      assert(math.abs(r.getDouble(2) - meanPre) < 1e-5)
      assert(math.abs(r.getDouble(3) - meanPost) < 1e-5)
      assert(math.abs(r.getDouble(4) - theta) < 1e-5)
      assert(math.abs(r.getDouble(5) -
        (meanPost - theta * (meanPre - meanPreAll))) < 1e-5)
    }
  }

  test("changepoint matches a brute-force per-split recompute") {
    // brute force: re-aggregate both segments per candidate split — the
    // O(n^2) algorithm the engine's prefix-sum scan replaces
    val daily = events.groupBy(e => (e._3, e._1 / dayNs))
      .map { case ((et, d), es) => (et, d, es.map(e => math.round(e._4 * 100)).sum) }
      .toSeq
    def sse(vs: Seq[Long]): Double = {
      val m = vs.sum.toDouble / vs.size
      vs.map(v => (v - m) * (v - m)).sum
    }
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val series = rows.sortBy(_._2)
      val splits = (1 until series.size).map { k =>
        val (l, r) = series.map(_._3).splitAt(k)
        (sse(l) + sse(r), series(k - 1)._2, k)
      }
      et -> splits.minBy(s => (s._1, s._2))
    }
    val got = Events.qChangepoint(tables).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (cost, splitDay, k) = expected(r.getString(0))
      assert(r.getLong(2) == k.toLong, s"${r.getString(0)} n_left")
      assert(r.getString(1) ==
        java.time.LocalDate.ofEpochDay(splitDay).toString)
      // engine cost is in value^2 units (cents^2 / 1e4), brute force in
      // cents^2 — tolerance absorbs the different summation orders
      assert(math.abs(r.getDouble(6) - cost / 1e4) < 1e-2)
    }
  }

  test("lang confusion matches a driver-side marker recompute") {
    val langs = TextAnalysis.markers.keys.toSeq.sorted
    val docs = tables.documents.select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val predicted = docs.map { case (lang, text) =>
      val toks = text.trim.toLowerCase.split(" +").toSeq
      val scores = langs.map(l =>
        l -> TextAnalysis.markers(l).map(w => toks.count(_ == w).toLong).sum)
      val best = scores.map(_._2).max
      val p = if (best > 0) scores.find(_._2 == best).get._1 else "und"
      (lang, p)
    }
    val cells = predicted.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = TextAnalysis.qLangConfusion(tables).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      assert(cells((r.getString(0), r.getString(1))) == r.getLong(2))
    }
    // shares sum to 1 per labeled language
    got.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    }
  }
}

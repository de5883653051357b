package graft

import graft.ops.{Events, Graph, Stats}

/** Round-5 wave: ordered-sequence pattern matching, type precedence,
  * BH false-discovery control, and personalized PageRank. Each test
  * recomputes the operator's claim driver-side from first principles over
  * sf0.001 (exact integer arithmetic where the engine uses it); the
  * DuckDB oracle covers engine-vs-engine equality separately.
  */
class SequenceFdrSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  private lazy val events: Seq[(Long, Long, Long, String)] =
    tables.events.select("user_id", "ts_ns", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  private lazy val userSeqs: Map[Long, String] =
    events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._2 / 1000, e._3)).map(_._4).mkString(",")
    }

  test("sequence match counts equal a driver-side regex sweep") {
    val got = Events.qSequenceMatch(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pats = Map(
      "signup_then_purchase" -> "signup.*purchase",
      "click_view_purchase" -> "click.*view.*purchase",
      "error_then_purchase" -> "error.*purchase")
    assert(got.keySet == pats.keySet)
    pats.foreach { case (name, re) =>
      val expected = userSeqs.values.count(_.matches(".*" + re + ".*")).toLong
      assert(got(name) == ((userSeqs.size.toLong, expected)),
        s"$name: got ${got(name)}, want ($expected of ${userSeqs.size})")
    }
  }

  test("type precedence matches first-occurrence comparison, ties count neither way") {
    val firsts: Map[(Long, String), Long] = events
      .groupBy(e => (e._1, e._4))
      .map { case (k, es) => k -> es.map(_._2 / 1000).min }
    val got = Events.qTypePrecedence(tables).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val both = firsts.keys.collect {
        case (u, t) if t == a && firsts.contains((u, b)) => u
      }.toSeq
      val aFirst = both.count(u => firsts((u, a)) < firsts((u, b)))
      assert(r.getLong(2) == both.size.toLong && r.getLong(3) == aFirst.toLong,
        s"($a,$b): got (${r.getLong(2)},${r.getLong(3)}), want (${both.size},$aFirst)")
    }
    // directional counts never double-count a tie
    val byPair = got.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    byPair.foreach { case ((a, b), r) =>
      val rev = byPair((b, a))
      assert(r.getLong(2) == rev.getLong(2)) // n_both symmetric
      assert(r.getLong(3) + rev.getLong(3) <= r.getLong(2))
    }
  }

  test("BH chi-square statistics are the exact integer formula and rejections are a rank prefix") {
    val cust = tables.customer.select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1)))
    val nn = BigInt(cust.length)
    val bb = BigInt(cust.count(_._2 == "BUILDING"))
    val got = Stats.qFdrBh(tables).collect()
    assert(got.length == 25)
    got.foreach { r =>
      val nat = r.getLong(0)
      val nNat = BigInt(cust.count(_._1 == nat))
      val nSeg = BigInt(cust.count(c => c._1 == nat && c._2 == "BUILDING"))
      val delta = nSeg * (nn - nNat - bb + nSeg) - (nNat - nSeg) * (bb - nSeg)
      val chi2 = (nn * delta * delta * 1000000) /
        (nNat * (nn - nNat) * bb * (nn - bb))
      assert(r.getLong(1) == nNat.toLong && r.getLong(2) == nSeg.toLong)
      assert(BigInt(r.getLong(3)) == chi2, s"nation $nat stat mismatch")
    }
    // ranks are 1..25, critical values strictly decrease, and the reject
    // set is exactly ranks 1..k*
    val byRank = got.sortBy(_.getLong(4))
    assert(byRank.map(_.getLong(4)).toSeq == (1L to 25L))
    byRank.sliding(2).foreach { w =>
      assert(w(0).getLong(5) > w(1).getLong(5))
    }
    val rejected = byRank.map(_.getLong(6))
    val k = rejected.lastIndexOf(1L) + 1
    assert(rejected.take(k).forall(_ == 1L) && rejected.drop(k).forall(_ == 0L))
  }

  test("personalized PageRank matches an exact driver-side replay") {
    val li = tables.lineitem.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val seed = deg.keys.min
    var rank = Map(seed -> 1000000000L)
    for (_ <- 1 to 3) {
      val contrib = edges.toSeq.flatMap { case (u, v) =>
        rank.get(u).map(r => v -> (r * 85) / (100 * deg(u)))
      }
      rank = (contrib :+ (seed -> 150000000L))
        .groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).sum }
    }
    val want = rank.toSeq.sortBy { case (n, r) => (-r, n) }.take(25)
    val got = Graph.qPpr(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}

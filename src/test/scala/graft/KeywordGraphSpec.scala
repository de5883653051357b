package graft

import graft.ext.TextAnalysis
import graft.ops.Graph

import org.apache.spark.sql.functions._

import java.math.RoundingMode

/** Round-5 wave: triangle census, RAKE keywords, PMI pairs, inverted
  * index, topic scoring. Each test recomputes the operator's claim
  * driver-side from first principles over sf0.001; the DuckDB oracle
  * covers engine-vs-engine equality separately.
  */
class KeywordGraphSpec extends SparkSuite {
  import spark.implicits._

  /** Spark/DuckDB-equivalent rounding of a double at `scale` digits
    * (shortest-decimal repr, HALf_UP) as a scale-pinned BigDecimal.
    */
  private def r9(d: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(d).setScale(9, RoundingMode.HALF_UP))

  private def docTokens: Seq[(Long, String, Array[String])] =
    tables.documents.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
      .map { case (id, src, text) =>
        (id, src, text.trim.toLowerCase.split(" +"))
      }

  test("triangle census matches a driver-side recompute") {
    val li = tables.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val und: Set[(Long, Long)] = li.toSeq.groupBy(_._1).values.flatMap {
      lines =>
        val ps = lines.map(_._2).distinct
        for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nTri = und.toSeq.map { case (u, v) => (adj(u) & adj(v)).size }.sum / 3
    val nodes = adj.keySet
    val open = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val row = Graph.qTriangleCount(tables).collect().head
    assert(row.getLong(0) == nodes.size.toLong)
    assert(row.getLong(1) == und.size.toLong)
    assert(row.getLong(3) == nTri.toLong)
    assert(row.getDouble(4) ==
      java.math.BigDecimal.valueOf(nTri * 3.0 / open)
        .setScale(9, RoundingMode.HALF_UP).doubleValue())
    // the degree orientation generates every wedge exactly once: closed
    // wedges (3 per triangle counted once at the lowest apex) are a subset
    assert(row.getLong(2) >= row.getLong(3))
  }

  test("rake keywords match a driver-side recompute") {
    val stop = Set("the", "a")
    // phrases: maximal stopword-free runs, capped at 4 tokens
    val phrases: Seq[(Long, String, Seq[String])] = docTokens.flatMap {
      case (id, src, toks) =>
        val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
        var cur = scala.collection.mutable.ArrayBuffer[String]()
        toks.foreach { w =>
          if (stop(w)) { if (cur.nonEmpty) runs += cur.toSeq; cur = cur.take(0) }
          else cur += w
        }
        if (cur.nonEmpty) runs += cur.toSeq
        runs.filter(_.size <= 4).map(ws => (id, src, ws))
    }
    val inst = phrases.flatMap { case (id, src, ws) =>
      ws.map(w => (src, w, ws.size.toLong))
    }
    val wscore: Map[(String, String), BigDecimal] = inst
      .groupBy(p => (p._1, p._2))
      .map { case (k, is) =>
        k -> r9(is.map(_._3).sum.toDouble / is.size)
      }
    val scored = phrases
      .map { case (_, src, ws) =>
        (src, ws.mkString(" "), ws.map(w => wscore((src, w))).sum)
      }
      .groupBy(p => (p._1, p._2))
      .map { case ((src, ph), is) => (src, ph, is.size.toLong, is.head._3) }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (src, ps) =>
      ps.toSeq.sortBy(p => (-p._4, p._2)).take(3).zipWithIndex
        .map { case ((_, ph, n, sc), i) =>
          (src, i + 1L, ph, n, sc.toDouble)
        }
    }.sortBy(p => (p._1, p._2))
    val got = TextAnalysis.qRakeKeywords(tables)
      .as[(String, Long, String, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("pmi pairs match a driver-side recompute") {
    val docs = docTokens
    val n = docs.size.toLong
    val dw: Seq[(Long, String)] = docs.flatMap { case (id, _, toks) =>
      toks.distinct.map(w => (id, w))
    }
    val df = dw.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    // vocabK=100 exceeds the corpus vocabulary, so no word is dropped here
    val pairs = dw.groupBy(_._1).values.flatMap { ws =>
      val sorted = ws.map(_._2).sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .filter(_._2 >= 5L)
    val expected = pairs.toSeq.map { case ((w1, w2), cxy) =>
      val pmi = java.math.BigDecimal
        .valueOf(math.log(cxy.toDouble * n / (df(w1) * df(w2))))
        .setScale(9, RoundingMode.HALF_UP).doubleValue()
      (w1, w2, cxy, pmi)
    }.sortBy(p => (-p._4, p._1, p._2)).take(25)
    val got = TextAnalysis.qPmiPairs(tables)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("inverted index matches a driver-side recompute") {
    val tf = docTokens
      .flatMap { case (id, _, toks) => toks.map(w => (w, id)) }
      .groupBy(identity).map { case ((w, id), xs) => (w, id, xs.size.toLong) }
      .toSeq
    val expected = tf.groupBy(_._1).toSeq.map { case (w, xs) =>
      val postings = xs.map(_._2).sorted.take(8)
      (w, xs.size.toLong, xs.map(_._3).sum, postings.mkString(","))
    }.sortBy(_._1)
    val got = TextAnalysis.qInvertedIndex(tables)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == expected)
  }

  test("topic scores match a driver-side recompute of the sparse multiply") {
    val docs = docTokens
    val n = docs.size.toLong
    val docWords = docs.flatMap { case (id, _, toks) =>
      toks.distinct.map(w => (id, w))
    }
    val cdf = docWords.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val hot = cdf.filter { case (_, c) => c > n * 0.5 }.keySet
    val sdf = docs
      .flatMap { case (id, src, toks) =>
        toks.distinct.filterNot(hot).map(w => (src, w))
      }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val topics: Map[String, Seq[(String, BigDecimal)]] = sdf.toSeq
      .groupBy(_._1._1)
      .map { case (src, xs) =>
        src -> xs.sortBy { case ((_, w), d) => (-d, w) }.take(10)
          .map { case ((_, w), d) => (w, r9(math.log1p(d.toDouble))) }
      }
    val expected = docs.flatMap { case (id, _, toks) =>
      val tf = toks.groupBy(identity).map { case (w, xs) => w -> xs.size }
      topics.toSeq.flatMap { case (topic, dict) =>
        val score = dict
          .collect { case (w, wt) if tf.contains(w) => wt * tf(w) }
          .foldLeft(BigDecimal(0))(_ + _)
        if (dict.exists(d => tf.contains(d._1))) Seq((id, topic, score))
        else Seq()
      }.sortBy(p => (-p._3, p._2)).take(1)
        .map(p => (p._1, p._2, p._3.toDouble))
    }.sortBy(_._1)
    val got = TextAnalysis.qTopicScores(tables)
      .as[(Long, String, Double)].collect().toSeq
    assert(got == expected)
  }

  test("power iteration matches a driver-side integer matvec recompute") {
    val vecs = tables.embeddings
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect()
      .map(_.map(x => math.floor(x * 1000.0 + 0.5).toLong).toArray)
    val dims = vecs.head.length
    val dot1 = vecs.map(_.sum)
    val c1 = Array.tabulate(dims)(d =>
      vecs.indices.map(r => dot1(r) * vecs(r)(d)).sum)
    // Spark `div` and DuckDB `//` both truncate toward zero — so must we
    val w = c1.map(_ / 1000000L)
    val dot2 = vecs.map(v => v.indices.map(d => w(d) * v(d)).sum)
    val c2 = Array.tabulate(dims)(d =>
      vecs.indices.map(r => dot2(r) * vecs(r)(d)).sum)
    val ss = c2.map(c => BigDecimal(c) * BigDecimal(c)).sum
    val got = graft.ext.Similarity.qPowerIteration(tables)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == (0L until dims.toLong))
    got.foreach { case (d, comp, loading) =>
      assert(comp == c2(d.toInt))
      assert(loading == c2(d.toInt).toDouble / math.sqrt(ss.toDouble))
    }
    // the loading vector is unit-norm up to float error
    val norm = got.map(g => g._3 * g._3).sum
    assert(math.abs(norm - 1.0) < 1e-9)
  }

  test("bpe merges match a driver-side pair-count recompute") {
    val freq = docTokens.flatMap(_._3)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    var seqs: Map[String, Long] =
      freq.map { case (w, f) => w.toSeq.mkString(" ") -> f }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val expected = (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map[String, Long]()
      seqs.foreach { case (seq, f) =>
        val syms = seq.split(" ")
        syms.indices.dropRight(1).foreach { i =>
          val p = s"${syms(i)} ${syms(i + 1)}"
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val merged = pair.replace(" ", "")
      seqs = seqs.toSeq.map { case (seq, f) =>
        (s" $seq ".replace(s" $pair ", s" $merged ").trim, f)
      }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      (r.toLong, pair, merged, cnt)
    }
    val got = TextAnalysis.qBpeMerges(tables)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("holt smoothing matches a driver-side sequential recurrence") {
    val daily = tables.events
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).cast("double").as("y"))
      .as[(String, Long, Double)].collect()
    val expected = daily.groupBy(_._1).toSeq.map { case (et, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      var l = ys.head
      var b = 0.0
      ys.tail.foreach { y =>
        val nl = 0.3 * y + 0.7 * (l + b)
        val nb = 0.1 * (0.3 * y + 0.7 * (l + b) - l) + 0.9 * b
        l = nl; b = nb
      }
      (et, ys.size.toLong, l, b, l + 7 * b)
    }.sortBy(_._1)
    val got = graft.ops.Events.qHoltSmoothing(tables)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == expected)
  }

  test("textrank replays the integer weighted-pagerank rounds exactly") {
    val stop = Set("the", "a")
    val docs = tables.documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val adj = docs.flatMap { case (_, text) =>
      val ws = text.trim.toLowerCase.split(" +").toSeq
        .filter(w => w.nonEmpty && !stop(w))
      ws.zip(ws.drop(1)).filter { case (a, b) => a != b }
    }
    val edges = (adj ++ adj.map(_.swap)).groupBy(identity)
      .map { case ((s, d), xs) => (s, d, xs.size.toLong) }.toSeq
    val wdeg = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum }
    val n = wdeg.size.toLong
    var r: Map[String, Long] = wdeg.keys.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 2) {
      r = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> (es.map { case (s, _, w) =>
          r(s) * 85L * w / (100L * wdeg(s)) }.sum + 150000000L / n)
      }
    }
    val expected = r.toSeq.map { case (w, rk) => (w, rk, n) }
      .sortBy { case (w, rk, _) => (-rk, w) }.take(20)
    val got = graft.ext.TextAnalysis.qTextrank(tables)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("holt-winters replays the textbook additive recurrence bit-exactly") {
    val daily = tables.events
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).cast("double").as("y"))
      .as[(String, Long, Double)].collect()
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val byDay = rows.map(r => r._2 -> r._3).toMap
      val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
      val ys = (lo to hi).map(d => byDay.getOrElse(d, 0.0)).toArray
      if (ys.length < 14) None
      else {
        val l0 = (ys(0) + ys(1) + ys(2) + ys(3) + ys(4) + ys(5) + ys(6)) / 7.0
        val b0 = ((ys(7) + ys(8) + ys(9) + ys(10) + ys(11) + ys(12) + ys(13))
          - (ys(0) + ys(1) + ys(2) + ys(3) + ys(4) + ys(5) + ys(6))) / 49.0
        var l = l0; var b = b0
        val ring = scala.collection.mutable.Queue(
          ys.take(7).map(_ - l0).toIndexedSeq: _*)
        ys.drop(7).foreach { y =>
          val s0 = ring.dequeue()
          val nl = 0.3 * (y - s0) + 0.7 * (l + b)
          val nb = 0.1 * ((0.3 * (y - s0) + 0.7 * (l + b)) - l) + 0.9 * b
          ring.enqueue(0.2 * (y - (0.3 * (y - s0) + 0.7 * (l + b))) + 0.8 * s0)
          l = nl; b = nb
        }
        val ringSeq = ring.toIndexedSeq
        Some((et, ys.length.toLong, l, b, ringSeq.head,
          l + 1.0 * b + ringSeq.head, l + 7.0 * b + ringSeq.last))
      }
    }.sortBy(_._1)
    val got = graft.ops.Events.qHoltWinters(tables)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == expected)
    // the forecast decomposes into its three components exactly
    got.foreach { g => assert(g._6 == g._3 + 1.0 * g._4 + g._5) }
  }
}

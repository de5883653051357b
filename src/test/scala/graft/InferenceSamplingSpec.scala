package graft

import graft.ext.{Classifier, Sampling, TextAnalysis}
import graft.ops.Stats

/** Round-5 wave: resampling-based inference and corpus-selection operators
  * — paired t, deterministic permutation test, Poisson bootstrap, Q–Q
  * drift, isotonic calibration, DSIR importance weights, Kneser–Ney, and
  * the A-ES weighted sample. Each test recomputes the claim driver-side
  * from first principles over sf0.001 (the isotonic check runs the REAL
  * iterative PAVA pooling against the engine's closed-form minimax); the
  * DuckDB oracle covers engine-vs-engine equality separately.
  */
class InferenceSamplingSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  // Spark's round(): BigDecimal HALF_UP on the double's exact value
  private def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val orders: Seq[(Long, Long, Long)] =
    tables.orders.select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
        expr("CAST(o_orderdate < TIMESTAMP '1998-07-01 00:00:00' AS INT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) * 2 + r.getInt(3))) // pack cents + era bit
      .toSeq

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    tables.documents
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  private def wordsOf(text: String): Seq[String] =
    text.replaceAll("^ +| +$", "").toLowerCase.split(" +", -1).toSeq

  test("paired t-test matches a driver-side recompute") {
    val pairs = orders.groupBy(_._1).values.flatMap { os =>
      val early = os.filter(o => (o._3 & 1L) == 1L).map(_._3 >> 1)
      val late = os.filter(o => (o._3 & 1L) == 0L).map(_._3 >> 1)
      if (early.nonEmpty && late.nonEmpty)
        Some(roundHalfUp(late.sum.toDouble / late.size -
          early.sum.toDouble / early.size, 6))
      else None
    }.toSeq
    val n = pairs.size
    val sd1 = pairs.map(BigDecimal(_)).sum
    val sd2 = pairs.map(d => BigDecimal(d) * BigDecimal(d)).sum
    val mean = sd1.toDouble / n
    val sd = math.sqrt((sd2.toDouble - sd1.toDouble * sd1.toDouble / n) / (n - 1))
    val tExp = mean / (sd / math.sqrt(n.toDouble))
    val r = Stats.qPairedTtest(tables).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - roundHalfUp(mean, 6)) < 1e-9)
    assert(math.abs(r.getDouble(2) - roundHalfUp(tExp, 6)) < 1e-9)
  }

  test("permutation test: md5 draws replayed, p-value exact ratio") {
    val perCust = orders.groupBy(_._1).map { case (c, os) =>
      c -> os.map(_._3 >> 1).sum
    }.toSeq
    def gap(arm: Long => Boolean): Double = {
      val (a1, a0) = perCust.partition(kv => arm(kv._1))
      a1.map(_._2).sum.toDouble / a1.size - a0.map(_._2).sum.toDouble / a0.size
    }
    val obs = gap(c => c % 2 == 1)
    // permutation b reads hex digit (b-1)%32 of digest md5(((b-1)/32):c)
    val extreme = (1 to 200).count { b =>
      val g = gap(c => (java.lang.Long.parseLong(
        md5hex(s"${(b - 1) / 32}:$c").slice((b - 1) % 32, (b - 1) % 32 + 1),
        16) % 2) == 1)
      math.abs(g) >= math.abs(obs)
    }
    val r = Stats.qPermutationTest(tables).collect().head
    assert(math.abs(r.getDouble(0) - roundHalfUp(obs, 6)) < 1e-9)
    assert(r.getLong(1) == 200L && r.getLong(2) == extreme.toLong)
    assert(math.abs(r.getDouble(3) -
      roundHalfUp((extreme + 1.0) / 201.0, 9)) < 1e-12)
  }

  test("qq drift: type-1 order statistics per source and corpus-wide") {
    val rows = ops.Stats.qQqDrift(tables).collect()
    val bySource = docs.groupBy(_._4)
    val corpus = docs.sortBy(d => (d._5, d._1)).map(_._5)
    def q1(sorted: Seq[Long], q: Long): Long =
      sorted(((q * sorted.size + 99) / 100).toInt - 1)
    assert(rows.length == bySource.size * 9)
    rows.foreach { r =>
      val s = bySource(r.getString(0)).sortBy(d => (d._5, d._1)).map(_._5)
      val q = r.getLong(1)
      assert(r.getLong(2) == q1(s, q), s"source quantile $q")
      assert(r.getLong(3) == q1(corpus, q), s"corpus quantile $q")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
  }

  test("isotonic calibration equals the real iterative PAVA pooling") {
    val r = Classifier.qIsotonicCalibration(tables).collect()
    // real PAVA: merge adjacent violators until monotone
    case class Block(w: Long, pos: Long) { def v: Double = pos.toDouble / w }
    var blocks = r.map(row => List(Block(row.getLong(1), row.getLong(2)))).toList
    var merged = true
    while (merged) {
      merged = false
      blocks = blocks.foldLeft(List.empty[List[Block]]) { (acc, b) =>
        acc match {
          case prev :: rest
            if prev.map(_.pos).sum.toDouble / prev.map(_.w).sum >
               (prev ++ b).map(_.pos).sum.toDouble / (prev ++ b).map(_.w).sum =>
            merged = true; (prev ++ b) :: rest
          case _ => b :: acc
        }
      }.reverse
    }
    val fitted = blocks.flatMap(bl => {
      val v = bl.map(_.pos).sum.toDouble / bl.map(_.w).sum
      bl.map(_ => v)
    })
    r.zip(fitted).foreach { case (row, f) =>
      assert(math.abs(row.getDouble(4) - roundHalfUp(f, 9)) < 1e-9,
        s"bin ${row.getLong(0)}: engine ${row.getDouble(4)} vs PAVA $f")
    }
    // and the fit is monotone non-decreasing
    r.map(_.getDouble(4)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ => ()
    }
  }

  test("importance weights: bucket LM replayed driver-side") {
    val tok = docs.flatMap(d =>
      wordsOf(d._2).filter(_.nonEmpty).map(w => (d._1, d._3 == "en", w)))
    val bucketOf = (w: String) => java.lang.Long.parseLong(
      md5hex(w).take(8), 16) % 4096
    val byB = tok.groupBy(x => bucketOf(x._3))
    val nt = tok.count(_._2).toLong
    val ns = tok.size - nt
    val wt = byB.map { case (b, xs) =>
      val ct = xs.count(_._2).toLong
      val cs = xs.size - ct
      b -> BigDecimal(
        (math.log(ct + 1.0) - math.log(nt + 4096.0) -
          math.log(cs + 1.0) + math.log(ns + 4096.0)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val exp = tok.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.map(x => wt(bucketOf(x._3))).sum)
    }
    val rows = TextAnalysis.qImportanceWeights(tables).collect()
    assert(rows.length == exp.size)
    rows.foreach { r =>
      val (nw, units) = exp(r.getLong(0))
      assert(r.getLong(1) == nw && r.getLong(2) == units,
        s"doc ${r.getLong(0)}")
      assert(r.getDouble(3) == units.toDouble / (nw.toDouble * 1e6))
    }
  }

  test("kneser-ney: probabilities from first-principles counts") {
    val grams = docs.flatMap { d =>
      val w = wordsOf(d._2)
      if (w.size < 2) Seq(w.mkString(" "))
      else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val cg = grams.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val typed = cg.toSeq.map { case (g, c) =>
      val parts = g.split(" ")
      (parts.head, parts.last, c)
    }
    val left = typed.groupBy(_._1).map { case (w1, xs) =>
      w1 -> (xs.map(_._3).sum, xs.size.toLong)
    }
    val right = typed.groupBy(_._2).map { case (w2, xs) => w2 -> xs.size.toLong }
    val ntypes = typed.size.toLong
    val probes = left.toSeq.sortBy { case (w1, (c1, _)) => (-c1, w1) }.take(5)
    val rows = TextAnalysis.qKneserNey(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val (c1, n1p) = left(w1)
      assert(probes.exists(_._1 == w1), s"$w1 not a top-5 context")
      assert(r.getLong(3) == c1 && r.getLong(4) == n1p)
      assert(r.getLong(5) == right(w2))
      val c12 = r.getLong(2)
      val num = BigInt(math.max(4 * c12 - 3, 0)) * BigInt(ntypes) +
        BigInt(3) * BigInt(n1p) * BigInt(right(w2))
      val p = num.toDouble / (c1 * 4).toDouble / ntypes.toDouble
      assert(math.abs(r.getDouble(7) - roundHalfUp(p, 9)) < 1e-12)
      // interpolated KN is a proper sub-probability: p in (0, 1]
      assert(r.getDouble(7) > 0 && r.getDouble(7) <= 1.0)
    }
    // ranks are 1..5 without gaps inside each probe context
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(g.map(_.getLong(6)).sorted.sameElements(1L to g.size))
    }
  }

  test("poisson bootstrap: md5 CDF inversion replayed; CI brackets mean") {
    val cdf = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    val os = orders.map(o => (o._2, o._3 >> 1))
    val means = (1 to 100).map { b =>
      var nw = 0L; var cw = BigInt(0)
      // replica b reads 32-bit slice (b-1)%4 of digest md5(((b-1)/4):ok)
      val g = (b - 1) / 4
      val s = (b - 1) % 4
      os.foreach { case (ok, cents) =>
        val u = java.lang.Long.parseLong(
          md5hex(s"$g:$ok").slice(8 * s, 8 * s + 8), 16)
        val w = cdf.indexWhere(u < _) match { case -1 => 8L; case k => k.toLong }
        nw += w; cw += BigInt(w) * cents
      }
      b -> cw.toDouble / nw.toDouble
    }.sortBy { case (b, m) => (m, b) }.map(_._2)
    val lo = means((25 * 100 + 999) / 1000 - 1)
    val hi = means((975 * 100 + 999) / 1000 - 1)
    val r = Sampling.qPoissonBootstrap(tables).collect().head
    assert(r.getLong(1) == 100L)
    assert(math.abs(r.getDouble(2) - roundHalfUp(lo, 6)) < 1e-9)
    assert(math.abs(r.getDouble(3) - roundHalfUp(hi, 6)) < 1e-9)
    assert(r.getDouble(2) <= r.getDouble(0) && r.getDouble(0) <= r.getDouble(3))
  }

  test("weighted sample: A-ES keys favor long documents") {
    val keys = docs.map { d =>
      val u = u32(d._2 + d._1.toString)
      val lnu = BigDecimal(-math.log((u + 1.0) / 4294967296.0) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (d._3, d._1, d._5, lnu, lnu.toDouble / d._5.toDouble)
    }
    val expect = keys.groupBy(_._1).map { case (lang, xs) =>
      lang -> xs.sortBy(x => (x._5, x._2)).take(5).map(_._2)
    }
    val rows = Sampling.qWeightedSample(tables).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, g) =>
      val got = g.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(got == expect(lang), s"lang $lang selection")
    }
    // rank column is 1..k per language
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to g.size))
    }
  }
}

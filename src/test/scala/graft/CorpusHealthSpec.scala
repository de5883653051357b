package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.ops.Graph

import org.apache.spark.sql.functions._

/** Round-9 wave: corpus-health reports (lexical richness, language
  * diversity, dedup cost savings) and probe-set link prediction. Each
  * test recomputes the operator's claim driver-side from first
  * principles over sf0.001; the DuckDB oracle covers engine-vs-engine
  * equality separately.
  */
class CorpusHealthSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs: Seq[(Long, String, String, String)] =
    tables.documents.select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)].collect().toSeq

  test("hapax ratio matches a driver-side recompute") {
    val bySource = docs.groupBy(_._2)
    val expected = bySource.map { case (src, ds) =>
      val words = ds.flatMap(_._4.trim.toLowerCase.split(" +"))
      val counts = words.groupBy(identity).map(_._2.size)
      val types = counts.size.toLong
      val hapax = counts.count(_ == 1).toLong
      src -> (words.size.toLong, types, hapax)
    }
    val got = TextAnalysis.qHapaxRatio(tables).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nTok, nTyp, nHap) = expected(r.getString(0))
      assert(r.getLong(1) == nTok && r.getLong(2) == nTyp &&
        r.getLong(3) == nHap)
      // ratios are exact-integer divisions — bit equality, not approx
      assert(r.getDouble(4) == nTyp.toDouble / nTok)
      assert(r.getDouble(5) == nHap.toDouble / nTyp)
    }
  }

  test("simpson diversity matches a driver-side recompute") {
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val n = ds.size.toLong
      val ss = ds.groupBy(_._3).values.map(g => g.size.toLong * g.size).sum
      src -> (n, ds.map(_._3).distinct.size.toLong,
        (n * n - ss).toDouble / (n * n))
    }
    val got = TextAnalysis.qSimpsonDiversity(tables).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, langs, simpson) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == langs)
      assert(r.getDouble(3) == simpson)
    }
    // a single-language source would score exactly 0; all scores in [0, 1)
    got.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0))
  }

  test("dedup savings matches a driver-side recompute on normalized text") {
    // keying by the normalized text itself is equivalent to the engine's
    // md5(normalized text) modulo collisions (none on this corpus)
    val keepId = docs.groupBy(_._4.trim.toLowerCase)
      .map { case (k, ds) => k -> ds.map(_._1).min }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val toks = ds.map { case (_, _, _, text) =>
        if (text.trim.isEmpty) 0L else text.trim.split(" +").length.toLong
      }
      val dup = ds.zip(toks).filter { case ((id, _, _, text), _) =>
        keepId(text.trim.toLowerCase) != id
      }
      src -> (ds.size.toLong, dup.size.toLong, toks.sum, dup.map(_._2).sum)
    }
    val got = Dedup.qDedupSavings(tables).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, nd, tt, td) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nd)
      assert(r.getLong(3) == tt && r.getLong(4) == td)
      assert(r.getDouble(5) == td.toDouble / tt)
    }
    // sf0.001 happens to carry no exact duplicates (every group keeps
    // itself) — the zero path is still a claim worth pinning; the dup
    // path is exercised by the sf0.01 oracle and the synthetic frame here
    val synth = Seq(
      (1L, "a", "en", "x y"), (2L, "a", "en", " X Y "), (3L, "b", "en", "x y z"))
      .toDF("doc_id", "source", "lang", "text")
    val out = {
      val d = synth.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        md5(lower(trim(col("text")))).as("h"))
      val k = d.groupBy("h").agg(min("doc_id").as("keep_id"))
      d.join(k, "h").withColumn("dup", (col("doc_id") =!= col("keep_id")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("dup").as("n_dup"),
          sum(col("n_tokens") * col("dup")).as("tokens_dupe"))
        .orderBy("source").collect()
    }
    // " X Y " normalizes to "x y": doc 2 is doc 1's duplicate (2 tokens)
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq(("a", 2L, 1L, 2L), ("b", 1L, 0L, 0L)))
  }

  test("link prediction matches a driver-side recompute") {
    val li = tables.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val adj: Map[Long, Set[Long]] = li.toSeq.groupBy(_._1).values
      .flatMap { lines =>
        val ps = lines.map(_._2).distinct
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.toSeq.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val expected = adj.keys.filter(_ % 199 == 0).flatMap { u =>
      val scores = adj(u).toSeq.flatMap(w => adj(w).toSeq)
        .filter(v => v != u && !adj(u).contains(v))
        .groupBy(identity).map { case (v, hits) => (v, hits.size.toLong) }
      scores.toSeq.sortBy { case (v, c) => (-c, v) }.take(5).zipWithIndex
        .map { case ((v, c), i) => (u, v, c, i + 1L) }
    }.toSet
    val got = Graph.qLinkPrediction(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // candidates are genuinely non-adjacent two-hop neighbors
    got.foreach { case (u, v, _, _) => assert(!adj(u).contains(v)) }
  }

  test("span alignments match a driver-side diagonal-run recompute") {
    // first principles: positions of shared rare 8-grams per pair,
    // maximal consecutive runs on each alignment diagonal
    val n = 8; val maxDf = 8; val minWords = 12
    val gramPos: Map[Long, Seq[(Int, String)]] = docs.map {
      case (id, _, _, text) =>
        val ws = text.trim.toLowerCase.split(" +").toSeq
        id -> ws.sliding(n).zipWithIndex.collect {
          case (g, i) if g.size == n => (i, g.mkString(" "))
        }.toSeq
    }.toMap
    val df = gramPos.values.flatMap(_.map(_._2).distinct)
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    val adm = df.collect { case (g, d) if d >= 2 && d <= maxDf => g }.toSet
    val ids = gramPos.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- i + 1 until ids.size
      (id1, id2) = (ids(i), ids(j))
      byGram = gramPos(id2).filter(p => adm(p._2)).groupBy(_._2)
      hits = gramPos(id1).filter(p => adm(p._2)).flatMap { case (p1, g) =>
        byGram.getOrElse(g, Nil).map { case (p2, _) => (p1, p2) }
      }
      ((_, runPs)) <- hits.groupBy { case (p1, p2) => p1 - p2 }.toSeq
      sorted = runPs.sortBy(_._1)
      run <- sorted.foldLeft(Seq.empty[Seq[(Int, Int)]]) { (acc, p) =>
        if (acc.nonEmpty && acc.last.last._1 + 1 == p._1)
          acc.init :+ (acc.last :+ p)
        else acc :+ Seq(p)
      }
      len = run.last._1 - run.head._1 + n
      if len >= minWords
    } yield (id1, id2, run.head._1.toLong, run.head._2.toLong, len.toLong))
      .toSet
    val got = Dedup.qSpanAlignments(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "corpus lost its aligned spans entirely")
  }

  test("span rewrite matches a driver-side cut-and-fingerprint recompute") {
    val n = 8
    val words: Map[Long, Seq[String]] = docs.map { case (id, _, _, text) =>
      id -> text.trim.toLowerCase.split(" +").toSeq
    }.toMap
    val gramDocs = words.toSeq
      .flatMap { case (id, ws) =>
        ws.sliding(n).filter(_.size == n).map(g => (g.mkString(" "), id))
      }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val sharedG = gramDocs.collect { case (g, d) if d > 1 => g }.toSet
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = words.map { case (id, ws) =>
      val covered = ws.sliding(n).zipWithIndex.collect {
        case (g, i) if g.size == n && sharedG(g.mkString(" ")) =>
          i until (i + n)
      }.flatten.toSet
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !covered(i) => w
      }
      id -> (ws.size.toLong, covered.size.toLong, md5hex(kept.mkString(" ")))
    }
    val got = TextAnalysis.qSpanRewrite(tables).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nTok, nRem, fp) = expected(r.getLong(0))
      assert(r.getLong(1) == nTok)
      assert(r.getLong(2) == nRem, s"doc ${r.getLong(0)} removed")
      assert(r.getString(3) == fp, s"doc ${r.getLong(0)} fingerprint")
    }
    // the corpus genuinely exercises the cut: some doc loses tokens and
    // some doc keeps everything
    assert(got.exists(_.getLong(2) > 0) && got.exists(_.getLong(2) == 0))
  }

  test("banded minhash achieves full recall vs brute-force truth (q_dedup_minhash oracle guard)") {
    // q_dedup_minhash's hash oracle asserts the banded pipeline recovers
    // EVERY jaccard >= 0.7 pair (the oracle is the ground-truth pair
    // set). 8x4 banding misses a pair at jaccard j with probability
    // (1-j^4)^8 — up to ~11% at exactly 0.7 — so that oracle is only
    // safe while the corpus' true pairs sit comfortably above threshold.
    // This test is the guard: it brute-forces the truth driver-side and
    // fails loudly the moment a REGENERATED corpus breaks either
    // condition. FALLBACK ON FAILURE: demote q_dedup_minhash to
    // rows-only (remove its oracleSql entry; re-add it to the
    // SparkEntrySpec rows-only allowlist) — the engine is not wrong, the
    // probabilistic recall contract is.
    val gramSets: Map[Long, Set[String]] = docs.map { case (id, _, _, text) =>
      val ws = text.trim.toLowerCase.split(" +").toSeq
      id -> ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val ids = gramSets.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.size).iterator
      a = gramSets(ids(i)); b = gramSets(ids(j))
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter)
      if jac >= 0.7
    } yield (ids(i), ids(j), jac)).toSeq
    assert(truth.nonEmpty, "corpus lost its near-dup pairs entirely")
    val got = Dedup.qDedupMinhash(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet ==
      truth.map(p => (p._1, p._2)).toSet,
      "banded pipeline recall broke vs brute force — see fallback note above")
    // margin report: the worst-case banding miss probability on THIS
    // corpus' weakest true pair (informational; the equality above is
    // the contract)
    val minJac = truth.map(_._3).min
    val missP = math.pow(1.0 - math.pow(minJac, 4), 8)
    info(f"weakest true pair jaccard=$minJac%.4f, banding miss prob=$missP%.6f")
  }
}

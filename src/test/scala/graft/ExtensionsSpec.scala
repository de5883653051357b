package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions=graft.functions.GraftExtensions` path: a
  * session built with the extensions class (not Engine.tune's imperative
  * registration) must expose the native functions through SQL and carry
  * the as-of planner strategy.
  */
class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions injects SQL functions and the as-of strategy") {
    val base = spark // keep the shared session to restore afterwards
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a static conf read at SparkContext setup;
    // the shared test context predates it, so use the builder's
    // programmatic form — the same class the conf would instantiate
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      val c = s2.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val sig = s2.sql(
        "SELECT hyperplane_sig(array(1.0d, -2.0d, 3.0d), 16) AS s")
        .head().getLong(0)
      assert(sig >= 0L && sig < (1L << 16))
      assert(s2.sessionState.planner.strategies
        .exists(_.isInstanceOf[graft.plans.AsOfJoinStrategy.type]),
        "as-of strategy not injected")
      assert(s2.sessionState.optimizer.batches.flatMap(_.rules)
        .contains(graft.plans.BandRangeJoin),
        "band-range-join rule not injected")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("jaro_winkler matches literature values and DuckDB edge semantics") {
    def jw(a: String, b: String): Double =
      spark.sql(s"SELECT jaro_winkler('$a', '$b') AS v").head().getDouble(0)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(jw("", "") == 0.0, "DuckDB semantics: empty input scores 0")
    assert(jw("abc", "") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abcd", "dcba") < 0.7, "no winkler bonus below the boost bar")
    // symmetric on real part names, interpreted == codegen'd path
    val pairs = tables.part.select("p_name").limit(20).collect().map(_.getString(0))
    pairs.sliding(2).foreach { case Array(a, b) =>
      val f = graft.functions.JaroWinklerImpl.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val g = graft.functions.JaroWinklerImpl.jw(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(f == g, s"asymmetric jw for '$a' / '$b'")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("name blocking caps pathological blocks and keys on both tokens") {
    import spark.implicits._
    // block A: 3 rows under one (brand, w1, w2) key -> 3 pairs at cap>=3,
    // dropped whole at cap 2. block B: same brand+w1, DIFFERENT w2 -> never
    // pairs with A (the second token is part of the key). single-token
    // names: '' key keeps them pairable with each other.
    val part = Seq(
      (1L, "Brand#1", "alpha beta one"),
      (2L, "Brand#1", "alpha beta two"),
      (3L, "Brand#1", "alpha beta three"),
      (4L, "Brand#1", "alpha gamma one"),
      (5L, "Brand#1", "solo"),
      (6L, "Brand#1", "solo")
    ).toDF("p_partkey", "p_brand", "p_name")
    def pairs(cap: Int): Set[(Long, Long)] =
      graft.ext.Dedup.nameBlockPairsOf(part, cap)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unbounded = pairs(2000)
    assert(unbounded == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)),
      "two-token key must split the gamma row away; single-token rows pair")
    val capped = pairs(2)
    assert(capped == Set((5L, 6L)),
      "a block over the cap contributes NO pairs (dropped whole)")
    // bounded expansion: candidate count <= blocks * cap^2 / 2 by construction
    assert(capped.size <= 2 * 2 * 6 / 2)
  }

  test("jaro fuzzy names: every levenshtein<=1 block pair is also a jaro match") {
    import org.apache.spark.sql.functions._
    val lev = graft.ext.Dedup.qFuzzyNames(tables, maxDist = 1)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jw = graft.ext.Dedup.qJaroNames(tables, minSim = 0.90)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lev.subsetOf(jw),
      "one-edit pairs on ~30-char names must score >= 0.90 jaro-winkler")
  }
}

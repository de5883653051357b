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
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}

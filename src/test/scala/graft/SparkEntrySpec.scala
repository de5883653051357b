package graft

/** Driver-contract invariants. */
class SparkEntrySpec extends SparkSuite {

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL strings have balanced quotes (JSON-dump safety)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.count(_ == '\'') % 2 == 0, s"$k has unbalanced quotes")
    }
  }
}

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

  test("README registry counts match the code") {
    // the README's "N queries + M DuckDB oracles" line went stale two
    // rounds running; pin it to the registry so drift fails the build
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """(\d+) queries \+ (\d+) DuckDB oracles""".r
      .findFirstMatchIn(readme)
    assert(m.isDefined, "README.md lost its registry-count line")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)} queries; code has ${SparkEntry.queries.size}")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.get.group(2)} oracles; code has ${SparkEntry.oracleSql.size}")
  }

  test("oracle SQL strings have balanced quotes (JSON-dump safety)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.count(_ == '\'') % 2 == 0, s"$k has unbalanced quotes")
    }
  }

  test("every query is oracled or on the documented rows-only allowlist") {
    // the weaker rows-only check is a DELIBERATE status, never drift:
    // each entry here is justified in SparkEntry's oracleSql scaladoc
    // (engine-specific signatures / approximate sketches / side-effectful
    // generators), and each signature family has a fully-oracled portable
    // companion. A new query missing from both maps fails this test.
    // q_approx_distinct / q_approx_quantile graduated to bounded-error
    // oracles in round 10 (exact values + tolerance flags; see Stats)
    val rowsOnly = Set("q_knn_lsh")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == rowsOnly,
      s"undocumented rows-only queries: ${unoracled -- rowsOnly}; " +
        s"stale allowlist entries: ${rowsOnly -- unoracled}")
  }
}

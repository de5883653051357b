package graft

import org.apache.spark.sql.functions._

/** Column-level lineage over analyzed plans: scans, expressions,
  * aggregates, joins, explodes, and unions all resolve to scan-leaf
  * columns.
  */
class LineageSpec extends SparkSuite {

  test("q1 aggregate lineage: every metric maps to its lineitem inputs") {
    val l = Lineage.columnLineage(SparkEntry.queries("q1_agg")(spark, sfDir))
    assert(l("l_returnflag") == Set("lineitem.l_returnflag"))
    assert(l("sum_qty") == Set("lineitem.l_quantity"))
    assert(l("sum_disc_price") ==
      Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(l("count_order") == Set.empty)
  }

  test("star join lineage crosses the joins to the right tables") {
    val l = Lineage.columnLineage(
      SparkEntry.queries("q_join_region_revenue")(spark, sfDir))
    assert(l("r_name") == Set("region.r_name"))
    assert(l("revenue") ==
      Set("lineitem.l_extendedprice", "lineitem.l_discount"))
  }

  test("explode and union lineage propagate through generators and branches") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("id", "t")
    val e = df.select(col("id"), explode(split(col("t"), " ")).as("w"))
    // toDF renames live in a Project ABOVE the LocalRelation leaf, whose
    // own attributes are _1/_2 — lineage names the true leaf columns
    val le = Lineage.columnLineage(e)
    assert(le("w") == Set("LocalRelation._2"))
    val u = df.select(col("id").as("k"))
      .union(df.select((col("id") + 1).as("k2")))
    val lu = Lineage.columnLineage(u)
    assert(lu("k") == Set("LocalRelation._1"))
  }

  test("report renders one sorted line per output column") {
    val q = SparkEntry.queries("q1_agg")(spark, sfDir)
    val r = Lineage.report(q)
    assert(r.linesIterator.size == q.columns.distinct.length)
    assert(r.contains("sum_qty <- lineitem.l_quantity"))
  }
}

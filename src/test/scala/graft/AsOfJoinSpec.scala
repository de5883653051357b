package graft

import graft.ops.AsOfJoin

import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("as-of join picks latest right row at-or-before left time, ties -> larger key") {
    val left = Seq(
      (1L, 10L, 100L), // user 10 at t=100
      (2L, 10L, 55L), // between orders
      (3L, 10L, 10L), // before any order -> null
      (4L, 99L, 500L) // user with no orders -> null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, 50L, 1001L),
      (10L, 50L, 1002L), // same time as above: larger key wins
      (10L, 100L, 1003L) // exactly at event 1's time: inclusive
    ).toDF("user_id", "rt", "order_id")

    val out = AsOfJoin
      .asOf(left, right, "user_id", "t", "rt", Seq("order_id"), "order_id")
      .select("event_id", "order_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(out(1L).contains(1003L)) // inclusive at equal time
    assert(out(2L).contains(1002L)) // tie at rt=50 -> larger order_id
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("forward as-of picks earliest right row at-or-after left time, ties -> smaller key") {
    val left = Seq(
      (1L, 10L, 100L), // exactly at an order time: inclusive
      (2L, 10L, 55L), // between orders -> next at t=100
      (3L, 10L, 10L), // before any order -> earliest (tie -> smaller key)
      (4L, 10L, 101L), // after the last order -> null
      (5L, 99L, 500L) // user with no orders -> null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, 50L, 1002L),
      (10L, 50L, 1001L), // same time: SMALLER key wins going forward
      (10L, 100L, 1003L)
    ).toDF("user_id", "rt", "order_id")

    val out = AsOfJoin
      .asOfForward(left, right, "user_id", "t", "rt", Seq("order_id"),
        "order_id")
      .select("event_id", "order_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(out(1L).contains(1003L)) // inclusive at equal time
    assert(out(2L).contains(1003L))
    assert(out(3L).contains(1001L)) // tie at rt=50 -> smaller order_id
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty)
  }

  test("custom physical as-of operator matches the composed version on tiny data") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 55L), (3L, 10L, 10L), (4L, 99L, 500L)
    ).toDF("event_id", "user_id", "t").repartition(5)
    val right = Seq(
      (10L, 50L, 1001L), (10L, 50L, 1002L), (10L, 100L, 1003L)
    ).toDF("user_id", "rt", "order_id").repartition(3)
    val out = graft.plans.AsOfJoinPlan
      .asOf(left, right, "user_id", "t", "rt", Seq("order_id"), "order_id")
      .select("event_id", "order_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(1003L))
    assert(out(2L).contains(1002L))
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("custom physical as-of operator matches the composed version on testdata") {
    import graft.ops.Events
    val native = Events.qAsOfJoinNative(tables).collect().toSeq
    val composed = Events.qAsOfJoin(tables).collect().toSeq
    assert(native == composed)
  }

  test("as-of against testdata matches a correlated-subquery reference") {
    import graft.ops.Events
    val got = Events.qAsOfJoin(tables)
    // independent reference: per event, max (date, key) among qualifying orders
    val ev = tables.events.select(col("event_id"), col("user_id"), col("ts"))
      .filter(pmod(col("event_id"), lit(10)) === 0)
    val ord = tables.orders.select(
      col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val ref = ev
      .join(ord, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .groupBy("event_id")
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("m.o_orderkey").as("last_orderkey"))
    val diff = got.select("event_id", "last_orderkey")
      .exceptAll(ref.select("event_id", "last_orderkey"))
    assert(diff.isEmpty, diff.collect().mkString(","))
  }
}

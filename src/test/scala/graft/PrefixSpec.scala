package graft

import graft.ops.Prefix

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** [[graft.ops.Prefix]] must reproduce the single-partition global window
  * bit-for-bit: the round-11 conversions replace `Window.orderBy` with the
  * two-pass range-partitioned prefix on fact-scaling frames, and every
  * converted query's oracle hash is pinned — so the helper itself is
  * property-tested against the window formulation it replaces.
  */
class PrefixSpec extends SparkSuite {

  // deterministic pseudo-random frame with ties in the VALUE domain but a
  // unique (v, id) total order — the shape every converted site has
  private def frame(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map { i =>
      val v = (i * 2654435761L) % 97 // collisions in v
      val y = (i * 40503L) % 7
      (v, i.toLong, y, BigDecimal(v * 100 + y).setScale(2))
    }.toDF("v", "id", "y", "dec")
  }

  test("running long sums (incl + excl), rowNumber, totals match the global window") {
    val df = frame(1000)
    val sort = Seq(col("v"), col("id"))
    val got = Prefix.running(df, sort,
      Seq(
        Prefix.Running("cum_y", col("y"), grandTotal = Some("tot_y")),
        Prefix.Running("prior_y", col("y"), inclusive = false)),
      rowNumber = Some("rn"), totalCount = Some("n"))

    val wIncl = Window.orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window.orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRank = Window.orderBy(sort: _*)
    val wAll = Window.partitionBy()
    val want = df
      .withColumn("cum_y", sum("y").over(wIncl))
      .withColumn("tot_y", sum("y").over(wAll))
      .withColumn("prior_y", sum("y").over(wExcl))
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))

    val cols = Seq("v", "id", "y", "cum_y", "tot_y", "prior_y", "rn", "n")
    assert(got.select(cols.map(col): _*).orderBy("v", "id").collect().toSeq ==
      want.select(cols.map(col): _*).orderBy("v", "id").collect().toSeq)
  }

  test("running decimal sum matches the global window in value AND type") {
    val df = frame(500)
    val sort = Seq(col("dec").desc, col("id"))
    val got = Prefix.running(df, sort,
      Seq(Prefix.Running("cum", col("dec"))))
    val want = df.withColumn("cum",
      sum("dec").over(Window.orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.schema("cum").dataType == want.schema("cum").dataType)
    assert(got.select("id", "cum").orderBy("id").collect().toSeq ==
      want.select("id", "cum").orderBy("id").collect().toSeq)
  }

  test("exclusive running max matches the global window (incl. leading nulls)") {
    val df = frame(300).groupBy("v").agg(max("y").as("gq"))
    val got = Prefix.running(df, Seq(col("v")),
      Seq(Prefix.Running("m_lt", col("gq"), inclusive = false, isMax = true)))
    val want = df.withColumn("m_lt",
      max("gq").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)))
    assert(got.select("v", "gq", "m_lt").orderBy("v").collect().toSeq ==
      want.select("v", "gq", "m_lt").orderBy("v").collect().toSeq)
  }

  test("ntile bucket arithmetic over the prefix rank matches ntile()") {
    for (n <- Seq(3, 4, 10, 41, 1000); buckets <- Seq(4, 10)) {
      val df = frame(n)
      val sort = Seq(col("v"), col("id"))
      val got = Prefix.running(df, sort, Nil,
          rowNumber = Some("i"), totalCount = Some("nn"))
        .withColumn("tile",
          expr(s"""CAST(CASE
            WHEN i <= (nn % $buckets) * (nn div $buckets + 1)
              THEN (i - 1) div (nn div $buckets + 1) + 1
            ELSE (nn % $buckets) +
              (i - 1 - (nn % $buckets) * (nn div $buckets + 1))
                div (nn div $buckets) + 1
            END AS BIGINT)"""))
      val want = df.withColumn("tile",
        ntile(buckets).over(Window.orderBy(sort: _*)).cast("long"))
      assert(got.select("id", "tile").orderBy("id").collect().toSeq ==
        want.select("id", "tile").orderBy("id").collect().toSeq,
        s"n=$n buckets=$buckets")
    }
  }

  test("freeLater: a frame survives one interleaved construction (two-generation lag)") {
    val s = spark
    import s.implicits._
    // simulate SparkEntry's wrapper: drain runs at the START of each
    // construction, freeLater during it
    Engine.drainDeferredFrees() // construction A begins
    val a = Engine.loopCheckpoint((1 to 100).toDF("x"))
    Engine.freeLater(a)
    Engine.drainDeferredFrees() // construction B begins — A must survive
    val b = Engine.loopCheckpoint((1 to 50).toDF("x"))
    Engine.freeLater(b)
    // materialize A AFTER B's construction — the round-10 queue freed A
    // at B's drain, which lost the lineage-truncated blocks
    assert(a.agg(sum("x")).head().getLong(0) == 5050L)
    Engine.drainDeferredFrees() // construction C begins — frees A
    assert(b.agg(sum("x")).head().getLong(0) == 1275L)
    Engine.drainDeferredFrees() // frees B
  }
}

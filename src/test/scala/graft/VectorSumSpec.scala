package graft

import org.apache.spark.sql.functions._

/** vector_sum must equal the posexplode/groupBy reference formulation,
  * including across repartitionings (the partial/merge path) and null
  * handling.
  */
class VectorSumSpec extends SparkSuite {
  import spark.implicits._

  test("vector_sum equals posexplode + per-dim sum across many partitions") {
    val df = (0 until 100)
      .map(i => (i % 3, Seq(i.toDouble, 2.0 * i, -i.toDouble)))
      .toDF("k", "v")
      .repartition(13)
    val fast = df.groupBy("k")
      .agg(call_function("vector_sum", col("v")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .toMap
    val ref = df
      .select(col("k"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("k", "d")
      .agg(sum("x").as("sx"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    assert(fast == ref)
  }

  test("null vectors are skipped; an all-null group yields null") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0))), (1, None), (1, Some(Seq(3.0, 4.0))),
      (2, None)
    ).toDF("k", "v").repartition(5)
    val out = df.groupBy("k")
      .agg(call_function("vector_sum", col("v")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> Option(r.get(1)).map(_ => r.getSeq[Double](1).toSeq))
      .toMap
    assert(out(1) == Some(Seq(4.0, 6.0)))
    assert(out(2) == None)
  }

  test("empty vectors are skipped like nulls, in any arrival order") {
    // empty-first and empty-last must both yield the sum of the non-empty
    // rows (an empty input must not be conflated with the "nothing seen"
    // buffer sentinel, which would make the result partition-order
    // dependent: silently dropped one way, a length-mismatch crash the other)
    for (rows <- Seq(
        Seq((1, Seq.empty[Double]), (1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0))),
        Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0)), (1, Seq.empty[Double])))) {
      val out = rows.toDF("k", "v").coalesce(1).groupBy("k")
        .agg(call_function("vector_sum", col("v")).as("s"))
        .collect()
      assert(out.head.getSeq[Double](1) == Seq(4.0, 6.0))
    }
    // a group of only empties has nothing to sum -> null, like all-null
    val onlyEmpty = Seq((9, Seq.empty[Double])).toDF("k", "v").groupBy("k")
      .agg(call_function("vector_sum", col("v")).as("s")).collect()
    assert(onlyEmpty.head.isNullAt(1))
  }

  test("mismatched vector lengths fail loudly") {
    val df = Seq((1, Seq(1.0)), (1, Seq(1.0, 2.0))).toDF("k", "v").coalesce(1)
    val e = intercept[Exception] {
      df.groupBy("k").agg(call_function("vector_sum", col("v"))).collect()
    }
    assert(e.getMessage != null)
  }
}

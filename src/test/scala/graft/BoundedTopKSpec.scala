package graft

import graft.ops.Relational

import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must be row-identical to the ranking-window
  * formulation, including tie handling and across repartitionings (the
  * partial/merge path).
  */
class BoundedTopKSpec extends SparkSuite {
  import spark.implicits._

  test("bounded_topk equals row_number window on the orders table") {
    val agg = Relational.qWindowTopk(tables).collect().toSeq
    val win = Relational.qWindowTopkWindowed(tables).collect().toSeq
    assert(agg == win)
  }

  test("ties and partial merges: many partitions, duplicate scores") {
    val df = Seq(
      (1L, 10.0, 100L), (1L, 10.0, 101L), (1L, 10.0, 102L), (1L, 9.0, 103L),
      (2L, 1.0, 200L), (2L, 2.0, 201L)
    ).toDF("k", "score", "id").repartition(7)

    def run(idAsc: Boolean) = df
      .groupBy("k")
      .agg(call_function("bounded_topk",
        struct(col("score"), col("id")), lit(2), lit(idAsc)).as("top"))
      .select(col("k"), posexplode(col("top")).as(Seq("i", "item")))
      .select(col("k"), col("item.id"), col("i"))
      .as[(Long, Long, Int)].collect().toSet

    // idAsc: ties by smaller id first
    assert(run(true) == Set((1L, 100L, 0), (1L, 101L, 1), (2L, 201L, 0), (2L, 200L, 1)))
    // idDesc: ties by larger id first
    assert(run(false) == Set((1L, 102L, 0), (1L, 101L, 1), (2L, 201L, 0), (2L, 200L, 1)))
  }

  test("eval is non-destructive: window aggregation re-evals the same buffer per row") {
    // as a window aggregate eval() runs once per input row over one shared
    // buffer; a draining eval would return a shrinking array after row 1
    val out = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 6.0, 12L))
      .toDF("k", "score", "id")
      .withColumn("top", expr(
        "bounded_topk(struct(score, id), 2, true) over (partition by k)"))
      .select(size(col("top"))).as[Int].collect().toSeq
    assert(out == Seq(2, 2, 2))
  }

  test("non-literal or mistyped k/idAsc arguments fail loudly instead of defaulting") {
    val df = Seq((1L, 5.0, 10L)).toDF("k", "score", "id")
    val e1 = intercept[Exception] {
      df.selectExpr("bounded_topk(struct(score, id), 5L)").collect()
    }
    assert(e1.getMessage.contains("literal INT"))
    val e2 = intercept[Exception] {
      df.selectExpr("bounded_topk(struct(score, id), 2, 1)").collect()
    }
    assert(e2.getMessage.contains("literal BOOLEAN"))
  }

  test("k larger than group size returns the whole group ranked") {
    val out = Seq((1L, 5.0, 1L), (1L, 7.0, 2L))
      .toDF("k", "score", "id")
      .groupBy("k")
      .agg(call_function("bounded_topk",
        struct(col("score"), col("id")), lit(10), lit(true)).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(out == 2)
  }
}

package graft

import graft.clean.Clean
import graft.transform.Transforms

import org.apache.spark.sql.functions._

/** Reference-semantics unit tests: cleaning (etl_pipeline.py:181-189) and
  * the transform edge cases called out in SURVEY.md §2.3.
  */
class CleanTransformSpec extends SparkSuite {
  import spark.implicits._

  test("cleanCommon dedups full rows and drops null rows except email") {
    val df = Seq(
      ("a", Some("x@y.z"), Some(1)),
      ("a", Some("x@y.z"), Some(1)), // exact dup -> dropped
      ("b", None, Some(2)), // null email -> kept
      ("c", Some("c@c.c"), None) // null other col -> dropped
    ).toDF("id", "email", "v")
    val cleaned = Clean.cleanCommon(df)
    val rows = cleaned.df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet == Set("a", "b"))
    val (in, out) = Clean.counts(cleaned)
    assert(in == 4 && out == 2)
  }

  test("cut binning: left-open right-closed, 0.0 and >1.0 -> null") {
    val df = Seq(0.0, 0.05, 0.3, 0.31, 0.6, 0.61, 1.0, 1.01)
      .toDF("churn_risk")
      .withColumn("label", Transforms.cutBin(col("churn_risk")))
    val got = df.collect().map(r => (r.getDouble(0), Option(r.getString(1)))).toMap
    assert(got(0.0).isEmpty) // pd.cut: exactly 0.0 -> null
    assert(got(0.05).contains("Low"))
    assert(got(0.3).contains("Low")) // right-closed
    assert(got(0.31).contains("Medium"))
    assert(got(0.6).contains("Medium"))
    assert(got(0.61).contains("High"))
    assert(got(1.0).contains("High"))
    assert(got(1.01).isEmpty)
  }

  test("sales transform: div-by-zero -> null, bad numerics -> 0, bad dates -> null") {
    val df = Seq(
      ("100.0", "4", "2026-01-02"),
      ("50.0", "0", "not-a-date"), // units=0 -> null ratio; bad date -> null
      ("junk", "2", "2026-02-03") // bad revenue -> 0
    ).toDF("revenue", "units", "date")
    val out = Transforms.sales(df).orderBy("date")
    val rows = out
      .select("revenue", "units", "revenue_per_unit", "date", "month")
      .collect()
    val byRev = rows.map(r => (r.getDouble(0), r)).toMap
    assert(byRev(100.0).getDouble(2) == 25.0)
    assert(byRev(100.0).getString(4) == "2026-01")
    assert(byRev(50.0).isNullAt(2)) // div by zero -> null, not Infinity
    assert(byRev(50.0).isNullAt(3)) // lenient date parse
    assert(byRev(0.0).getDouble(2) == 0.0) // junk -> 0, 0/2 = 0
  }

  test("p90 flag uses linear interpolation (pandas quantile semantics)") {
    // quantile(0.9) of 1..10 with linear interpolation = 9.1
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val q = df.agg(expr("percentile(v, 0.9D)").as("q")).head.getDouble(0)
    assert(math.abs(q - 9.1) < 1e-12)
    val flagged = Transforms.withQuantileFlag(df, "v", "hi")
    assert(flagged.filter(col("hi")).select("v").as[Double].collect().toSet == Set(10.0))
  }

  test("finance transform: net_flow and is_deficit") {
    val df = Seq((100.0, 40.0, "2026-01-01"), (10.0, 40.0, "2026-01-01"))
      .toDF("credit", "debit", "txn_date")
    val out = Transforms.finance(df).select("net_flow", "is_deficit").collect()
    assert(out.map(r => (r.getDouble(0), r.getBoolean(1))).toSet ==
      Set((60.0, false), (-30.0, true)))
  }

  test("property: cleanCommon invariants hold across generated inputs") {
    // idempotence and in == out + dropped, over varied shapes/sizes
    for (n <- Seq(1L, 37L, 500L); dupFactor <- Seq(1, 3)) {
      val base = graft.sources.Generators.customers(spark, n)
      val df = (1 to dupFactor).map(_ => base).reduce(_ union _)
      val c1 = Clean.cleanCommon(df, s"p1_${n}_$dupFactor")
      val out1 = c1.df.count()
      val (in1, got1) = Clean.counts(c1)
      assert(in1 == n * dupFactor, s"n=$n dup=$dupFactor")
      assert(got1 == out1 && in1 >= out1)
      // idempotence: cleaning the cleaned output drops nothing
      val c2 = Clean.cleanCommon(c1.df, s"p2_${n}_$dupFactor")
      assert(c2.df.count() == out1)
    }
  }

  test("customers transform fills null email with constant") {
    val df = Seq((Some("a@b.c"), 0.5, 365L), (None, 0.9, 730L))
      .toDF("email", "churn_risk", "tenure_days")
    val out = Transforms.customers(df)
    assert(out.filter(col("email") === "unknown@na.com").count() == 1)
    assert(out.select("tenure_yrs").as[Double].collect().toSet == Set(1.0, 2.0))
  }
}

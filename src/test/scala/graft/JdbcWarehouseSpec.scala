package graft

import graft.load.Warehouse

import org.apache.spark.sql.SaveMode

/** SQL-database warehouse mode (reference etl_pipeline.py:234-242): load
  * replace/append + readback count over embedded Derby via Spark's JDBC
  * source — the same code path a networked warehouse would use.
  */
class JdbcWarehouseSpec extends SparkSuite {
  import spark.implicits._

  test("jdbc warehouse round trip: replace, append, count, missing -> 0") {
    val root = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val wh = Warehouse(spark, root)
    val df = Seq((1L, "a", true), (2L, "b", false)).toDF("id", "name", "flag")

    wh.loadJdbc(df, "t1") // if_exists="replace"
    assert(wh.tableCountJdbc("t1") == 2L)
    wh.loadJdbc(df, "t1", SaveMode.Append) // if_exists="append"
    assert(wh.tableCountJdbc("t1") == 4L)
    wh.loadJdbc(df, "t1") // replace drops the appended rows
    assert(wh.tableCountJdbc("t1") == 2L)

    // load-time coercion applies on the JDBC path too (bool -> int,
    // reference etl_pipeline.py:273-274)
    val flagType = wh.tableJdbc("t1").schema("flag").dataType.typeName
    assert(flagType != "boolean", s"flag stored as $flagType")

    // missing table -> 0, like the reference's bare-except readback
    assert(wh.tableCountJdbc("no_such_table") == 0L)
  }

  test("keyed upsert replaces matching rows, keeps the rest, inserts new keys") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val wh = Warehouse(spark, root)
    wh.upsert(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "t", Seq("id"))
    assert(wh.tableCount("t") == 3L)
    // update key 2, insert key 4
    wh.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"), "t", Seq("id"))
    val got = wh.table("t").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
    // idempotent replay of the same batch
    wh.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "v"), "t", Seq("id"))
    assert(wh.table("t").as[(Long, String)].collect().toMap == got)
    // no leftover staging directories after the atomic swap
    val left = new java.io.File(root).list().toSet
    assert(!left.exists(n => n.contains("__tmp") || n.contains("__old")), left)
  }

  test("cdc apply: latest-per-key wins, deletes drop, replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val wh = Warehouse(spark, root)
    // seed
    wh.applyCdc(
      Seq(("I", 1L, 1L, "a"), ("I", 2L, 2L, "b"), ("I", 3L, 3L, "c"))
        .toDF("op", "seq", "id", "v"),
      "t", Seq("id"))
    assert(wh.tableCount("t") == 3L)
    // one batch holding an update superseded by a delete (key 2), an
    // update (key 3), and an insert (key 4) — compaction keeps max seq
    val batch = Seq(
      ("U", 10L, 2L, "B"), ("D", 11L, 2L, "x"),
      ("U", 12L, 3L, "C"), ("I", 13L, 4L, "d"))
      .toDF("op", "seq", "id", "v")
    wh.applyCdc(batch, "t", Seq("id"))
    val got = wh.table("t").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 3L -> "C", 4L -> "d"))
    // at-least-once delivery: replaying the same batch changes nothing
    wh.applyCdc(batch, "t", Seq("id"))
    assert(wh.table("t").as[(Long, String)].collect().toMap == got)
    val left = new java.io.File(root).list().toSet
    assert(!left.exists(n => n.contains("__tmp") || n.contains("__old")), left)
  }

  test("upsert with null-valued keys stays idempotent on replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_null").toString
    val wh = Warehouse(spark, root)
    val batch = Seq((Some(1L), "a"), (None, "nk")).toDF("id", "v")
    wh.upsert(batch, "t", Seq("id"))
    wh.upsert(batch, "t", Seq("id")) // replay: null key must match null key
    val got = wh.table("t").as[(Option[Long], String)].collect().toSeq
    assert(got.sortBy(_._2) == Seq((Some(1L), "a"), (None, "nk")))
  }

  test("schema evolution: appended batches with new columns merge; old rows null-fill") {
    val root = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    val wh = Warehouse(spark, root)
    wh.load(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    // upstream adds a column; the append lands with the wider schema
    wh.load(Seq((3L, "c", 0.5)).toDF("id", "v", "score"), "t", SaveMode.Append)
    val merged = wh.tableEvolved("t")
    assert(merged.columns.toSet == Set("id", "v", "score"))
    val got = merged.select("id", "v", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
    // the plain reader still works (first-footer schema, no merge cost)
    assert(wh.table("t").count() == 3L)
  }

  test("compact merges small files, preserves data, sorts within files") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val wh = Warehouse(spark, root)
    // simulate small-file accretion: 40 single-row appends -> >= 40 files
    val rows = (1L to 40L).map(i => (i, s"v$i"))
    wh.load(rows.toDF("id", "v").repartition(40), "t")
    def parquetFiles() = new java.io.File(wh.path("t"))
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = parquetFiles()
    assert(before >= 15, s"expected many small files, got $before")
    wh.compact("t", sortCols = Seq("id"))
    val after = parquetFiles()
    assert(after < before && after >= 1, s"$before -> $after")
    // data survives exactly
    val got = wh.table("t").as[(Long, String)].collect().toSet
    assert(got == rows.toSet)
    // no staging dirs left behind by the swap
    val left = new java.io.File(root).list().toSet
    assert(!left.exists(n => n.contains("__tmp") || n.contains("__old")), left)
    // each output file is internally sorted by the cluster column AND the
    // files hold disjoint key ranges (repartitionByRange -> file-level
    // min/max pruning)
    val ranges = new java.io.File(wh.path("t")).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("id").as[Long].collect().toSeq
        assert(ids == ids.sorted, s"file ${f.getName} not sorted")
        if (ids.isEmpty) None else Some((ids.head, ids.last))
      }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, "file key ranges overlap")
      case _ => ()
    }
  }
}

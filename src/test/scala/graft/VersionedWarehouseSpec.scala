package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Snapshot-versioned warehouse tables: immutable v=N directories + an
  * atomically repointed _LATEST, giving time travel, O(1) rollback, and
  * retention vacuum (the minimal lakehouse triad).
  */
class VersionedWarehouseSpec extends SparkSuite {
  import spark.implicits._

  private def wh() =
    load.Warehouse(spark, Files.createTempDirectory("graft_ver").toString)

  test("write/read/time-travel: latest and pinned versions both resolve") {
    val w = wh()
    val v1 = w.loadVersioned(Seq((1, "a"), (2, "b")).toDF("k", "v"), "t")
    val v2 = w.loadVersioned(Seq((1, "a2"), (3, "c")).toDF("k", "v"), "t")
    assert(v1 == 1 && v2 == 2)
    assert(w.currentVersion("t").contains(2L))
    assert(w.tableAt("t").orderBy("k").as[(Int, String)].collect().toSeq ==
      Seq((1, "a2"), (3, "c")))
    assert(w.tableAt("t", v1).orderBy("k").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("rollback repoints without data movement; versions stay monotonic") {
    val w = wh()
    w.loadVersioned(Seq((1, "old")).toDF("k", "v"), "t")
    w.loadVersioned(Seq((1, "new")).toDF("k", "v"), "t")
    w.rollback("t", 1)
    assert(w.tableAt("t").as[(Int, String)].collect().head == ((1, "old")))
    // a write after rollback must NOT reuse version 2
    val v3 = w.loadVersioned(Seq((1, "newer")).toDF("k", "v"), "t")
    assert(v3 == 3)
    assert(w.versions("t") == Seq(1L, 2L, 3L))
    assert(w.tableAt("t").as[(Int, String)].collect().head == ((1, "newer")))
    intercept[java.util.NoSuchElementException](w.rollback("t", 99))
  }

  test("vacuum keeps the newest snapshots and never the pointer target") {
    val w = wh()
    (1 to 4).foreach(i => w.loadVersioned(Seq((i, s"r$i")).toDF("k", "v"), "t"))
    w.rollback("t", 1) // pointer at the OLDEST version
    val deleted = w.vacuum("t", keepLast = 2)
    // v1 survives (pointer target) even though it is outside keepLast
    assert(deleted == Seq(2L))
    assert(w.versions("t") == Seq(1L, 3L, 4L))
    assert(w.tableAt("t").as[(Int, String)].collect().head == ((1, "r1")))
  }

  test("streaming sink: every micro-batch commits a time-travelable snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = wh()
    val mem = MemoryStream[Int]
    val q = mem.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) w.loadVersioned(df, "stream_t"): Unit
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ver_ck").toString)
      .start()
    try {
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      mem.addData(4)
      q.processAllAvailable()
      assert(w.versions("stream_t") == Seq(1L, 2L))
      assert(w.tableAt("stream_t", 1).count() == 3)
      assert(w.tableAt("stream_t").count() == 1) // latest = second batch
    } finally q.stop()
  }

  test("a partial snapshot directory without a pointer update is invisible") {
    val w = wh()
    w.loadVersioned(Seq((1, "committed")).toDF("k", "v"), "t")
    // simulate a crash mid-write: v=2 directory exists, pointer untouched
    Seq((9, "torn")).toDF("k", "v").write
      .parquet(w.path("t") + "__versions/v=2")
    assert(w.currentVersion("t").contains(1L))
    assert(w.tableAt("t").as[(Int, String)].collect().head == ((1, "committed")))
    // the next write overwrites the torn directory and commits past it
    val v = w.loadVersioned(Seq((2, "next")).toDF("k", "v"), "t")
    assert(v == 3) // torn v=2 occupies the slot; numbering skips, never reuses
    assert(w.tableAt("t").as[(Int, String)].collect().head == ((2, "next")))
  }
}

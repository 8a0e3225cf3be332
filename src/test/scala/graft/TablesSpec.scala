package graft

/** Scan-memo semantics: reuse within a session, explicit refresh for
  * long-lived sessions (the memo pins the file listing at first read).
  */
class TablesSpec extends SparkSpec {

  import spark.implicits._

  test("memoized scan pins the listing; invalidate makes new files visible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    Seq(1, 2, 3).toDF("x").write.parquet(s"$dir/t.parquet")
    assert(Tables.load(spark, dir, "t").count() === 3)
    // same memoized plan comes back: the post-first-read arrival is invisible
    Seq(4, 5).toDF("x").write.mode("append").parquet(s"$dir/t.parquet")
    assert(Tables.load(spark, dir, "t").count() === 3)
    Tables.invalidate(dir)
    assert(Tables.load(spark, dir, "t").count() === 5)
    // other directories' memos survive an unrelated invalidate
    val other = Tables.load(spark, dir, "t")
    Tables.invalidate("/nonexistent")
    assert(Tables.load(spark, dir, "t") eq other)
  }
}

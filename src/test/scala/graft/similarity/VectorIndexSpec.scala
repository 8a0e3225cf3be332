package graft.similarity

import graft.SparkSpec
import graft.store.EventStore
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {

  import spark.implicits._

  private def mkStore(dir: String, rows: Seq[(String, Long, String, String)]): Unit =
    EventStore.write(rows.toDF("session_id", "seq", "ts", "raw_json")
      .withColumn("doc_type", lit("ws_event")), dir)

  test("embed: deterministic, L2-normalized, input-sensitive") {
    val e = VectorIndex.embed(Seq(
      ("a", "the quick brown fox"), ("b", "the quick brown fox"),
      ("c", "completely different payload tokens")).toDF("id", "chunk_text"))
      .select("id", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(e("a") === e("b"))
    assert(e("a") !== e("c"))
    val norm = math.sqrt(e("a").map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    assert(e("a").length === VectorIndex.Dim)
  }

  test("build + incremental build + cell-partitioned search round trip") {
    val store = java.nio.file.Files.createTempDirectory("graft-vstore").toString
    val index = java.nio.file.Files.createTempDirectory("graft-vindex").toString + "/idx"
    mkStore(store, Seq(
      ("s1", 0L, "2024-01-01T00:00:00", "alpha bravo charlie delta"),
      ("s1", 1L, "2024-01-01T00:00:01", "alpha bravo charlie echo"),
      ("s2", 0L, "2024-01-01T00:00:02", "zulu yankee xray whiskey")))
    val ckpt1 = VectorIndex.build(spark, store, index, sinceTs = "", chunkSize = 1)
    assert(ckpt1 === "2024-01-01T00:00:02")
    // physical layout: cell= partitions (the fan-out reducer)
    val parts = new java.io.File(index).listFiles().map(_.getName)
    assert(parts.exists(_.startsWith("cell=")))
    // search finds the matching chunk first
    val hit = VectorIndex.search(spark, index, "alpha bravo charlie delta").head()
    assert(hit.getAs[String]("chunk_text").contains("alpha bravo charlie delta"))
    assert(hit.getAs[Double]("cosine") > 0.9)
    // incremental: a later event extends the index without rebuilding
    mkStore(store, Seq(("s3", 0L, "2024-01-01T00:00:05", "golf hotel india juliet")))
    val ckpt2 = VectorIndex.build(spark, store, index, sinceTs = ckpt1, chunkSize = 1)
    assert(ckpt2 === "2024-01-01T00:00:05")
    val hit2 = VectorIndex.search(spark, index, "golf hotel india juliet").head()
    assert(hit2.getAs[String]("chunk_text").contains("golf hotel"))
    // old content still indexed exactly once
    assert(spark.read.parquet(index).count() === 4)
  }
}

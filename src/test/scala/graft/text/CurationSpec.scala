package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the curation operators (q57/q58/q59) beyond the oracle's
  * cell-exact check — properties that must hold on ANY corpus.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(dir: String, rows: (Long, String)*): Unit =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q57 packing: token conservation, contiguous doc ranges, ordered packs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pack").toString
    val rnd = new scala.util.Random(7L)
    corpus(dir, (1L to 200L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(200))("w").mkString(" ")): _*)
    val packs = TextQueries.q57SequencePacking(spark, dir).collect()
    val totalTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    // every token lands in exactly one pack
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum === totalTokens)
    assert(packs.map(_.getAs[Long]("n_docs")).sum === 200L)
    // a pack never spans shards
    assert(packs.forall { r =>
      val sh = r.getAs[Long]("shard")
      r.getAs[Long]("first_doc") / TextQueries.PackShardDocs == sh &&
        r.getAs[Long]("last_doc") / TextQueries.PackShardDocs == sh
    })
    // packs partition the doc-id line into contiguous, ordered ranges:
    // shard = doc_id div K is monotone in doc_id, so (shard, pack_id)
    // order IS global doc order, and a pack never spans shards
    val ranges = packs
      .sortBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_id")))
      .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    assert(ranges.forall { case (a, b) => a <= b })
    ranges.sliding(2).foreach {
      case Array((_, lastA), (firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
  }

  test("q58: a verbatim eval copy of a train doc is flagged; disjoint text is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decon").toString
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    // hashBucket01(1)=train? pick ids empirically: find a train id and an
    // eval id under the 0.8 split
    val ids = (1L to 40L)
    val bucket = ids.map(i => i -> {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      h.toDouble / 4294967295.0
    }).toMap
    val trainId = ids.find(bucket(_) < 0.8).get
    val evalIds = ids.filter(bucket(_) >= 0.8).take(2)
    val Seq(evalCopy, evalClean) = evalIds.toSeq
    corpus(dir,
      trainId -> shared,
      evalCopy -> shared, // verbatim copy => must be flagged
      evalClean -> (1 to 12).map(i => s"other$i").mkString(" "))
    val out = TextQueries.q58Decontamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(evalCopy) === true)
    assert(out(evalClean) === false)
    // short eval doc still appears, unflagged (8-gram check cannot see
    // it); fresh dir — Tables.load memoizes the file listing per dir
    val dir2 = java.nio.file.Files.createTempDirectory("graft-decon2").toString
    corpus(dir2,
      trainId -> shared,
      evalCopy -> "tok1 tok2 tok3")
    val short = TextQueries.q58Decontamination(spark, dir2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(short(evalCopy) === false)
  }
}

package graft.multimodal

import graft.SparkSpec
import graft.multimodal.WebmDemux._

class WebmDemuxSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fixture = demoFixture()

  test("committed fixture is byte-identical to the muxer's output") {
    val in = getClass.getResourceAsStream("/graft/multimodal/video_demo_64x48.webm")
    assert(in != null, "fixture not committed — run FixtureGen")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(fixture))
  }

  test("probe reads doctype, info, and both track entries") {
    val info = probe(fixture)
    assert(info.docType === "webm")
    assert(info.timestampScaleNs === 1000000L)
    assert(info.durationTicks === DurationTicks)
    assert(info.tracks.map(_.trackNo) === Seq(1, 2))
    val vid = info.tracks.head
    assert((vid.trackType, vid.codec, vid.width, vid.height) ===
      ((1, "V_VP9", 64, 48)))
    val aud = info.tracks(1)
    assert((aud.trackType, aud.codec, aud.samplingHz) ===
      ((2, "A_OPUS", 48000.0)))
  }

  test("cluster walk resolves absolute timestamps and payload ranges") {
    val byTrack = blocks(fixture).groupBy(_.trackNo)
    val vid = byTrack(1).sortBy(_.absTsTicks)
    assert(vid.map(_.absTsTicks) === (0 until VidN).map(vidTsMs))
    assert(vid.map(_.size) === (0 until VidN).map(vidSize))
    // cluster-2 blocks carry RELATIVE timestamps: abs must still be 40·i
    assert(vid(3).absTsTicks === 120L)
    for ((blk, i) <- vid.zipWithIndex)
      assert(fixture(blk.payloadOffset.toInt) === vidFill(i))
    val aud = byTrack(2).sortBy(_.absTsTicks)
    assert(aud.map(_.absTsTicks) === (0 until AudN).map(audTsMs))
    for ((blk, i) <- aud.zipWithIndex)
      assert(fixture((blk.payloadOffset + blk.size - 1).toInt) === audFill(i))
  }

  test("corrupt input: truncation and non-webm bytes fail clean") {
    intercept[IllegalArgumentException](probe(fixture.take(40)))
    intercept[IllegalArgumentException](blocks("not ebml at all".getBytes("US-ASCII")))
  }

  test("demuxBlocks strides per track type; no shuffle in the plan") {
    val media = Seq((9L, fixture)).toDS()
    val rows = demuxBlocks(media, videoStride = 3, audioStride = 2)
      .collect().sortBy(r => (r.track_no, r.block_idx))
    assert(rows.filter(_.kind == "video").map(_.block_idx).toSeq === Seq(0, 3))
    assert(rows.filter(_.kind == "audio").map(_.block_idx).toSeq === Seq(0, 2))
    val v3 = rows.find(r => r.kind == "video" && r.block_idx == 3).get
    assert(v3.abs_ts_ms === 120L)
    assert(v3.payload_mean === (20 + 11 * 3).toDouble)
    val plan = demuxBlocks(media, 3, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

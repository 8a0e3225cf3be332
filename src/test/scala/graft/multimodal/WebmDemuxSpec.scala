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

  // --- lacing / BlockGroup / unknown-size (round-15 ADVICE) --------------

  /** Minimal single-track segment wrapping the given cluster-child bytes. */
  private def segWith(clusterKids: Array[Byte]*): Array[Byte] = {
    val header = elem(0x1A45DFA3L, selem(0x4282L, "webm"))
    val info = elem(0x1549A966L, uelem(0x2AD7B1L, 1000000L))
    val tracks = elem(0x1654AE6BL,
      elem(0xAEL, uelem(0xD7L, 1), uelem(0x83L, 1), selem(0x86L, "V_VP9")))
    val cluster = elem(0x1F43B675L, cat(uelem(0xE7L, 0L) +: clusterKids: _*))
    cat(header, elem(0x18538067L, info, tracks, cluster))
  }
  private def frame(n: Int, fill: Int) = Array.fill[Byte](n)(fill.toByte)
  private def payloadOf(b: Array[Byte], blk: Block): Seq[Byte] =
    b.slice(blk.payloadOffset.toInt, (blk.payloadOffset + blk.size).toInt).toSeq

  test("Xiph lacing splits frames, including a 255-byte frame (FF 00 run)") {
    val frames = Seq(frame(255, 1), frame(7, 2), frame(300, 3), frame(4, 4))
    val b = segWith(simpleBlockXiph(1, 5, frames))
    val got = blocks(b)
    assert(got.map(_.size) === frames.map(_.length))
    assert(got.map(_.absTsTicks).distinct === Seq(5L))
    for ((blk, f) <- got.zip(frames)) assert(payloadOf(b, blk) === f.toSeq)
  }

  test("EBML lacing decodes the signed-delta size table") {
    val frames = Seq(frame(500, 1), frame(100, 2), frame(260, 3), frame(9, 4))
    val b = segWith(simpleBlockEbml(1, 0, frames))
    val got = blocks(b)
    assert(got.map(_.size) === frames.map(_.length))
    for ((blk, f) <- got.zip(frames)) assert(payloadOf(b, blk) === f.toSeq)
  }

  test("fixed lacing splits the remainder evenly and rejects a ragged one") {
    val frames = Seq(frame(12, 1), frame(12, 2), frame(12, 3))
    val b = segWith(simpleBlockFixed(1, 0, frames))
    val got = blocks(b)
    assert(got.map(_.size) === Seq(12, 12, 12))
    for ((blk, f) <- got.zip(frames)) assert(payloadOf(b, blk) === f.toSeq)
    // 37 bytes across 3 "equal" frames is a malformed file, not silent data:
    // hand-built block = track VINT 0x81, relTs 0, flags 0x84 (fixed
    // lacing), frame-count byte 2 (= 3 frames), then a 37-byte payload
    intercept[IllegalArgumentException] {
      blocks(segWith(elem(0xA3L,
        Array(0x81.toByte, 0, 0, (0x80 | 0x04).toByte, 2.toByte),
        frame(37, 7))))
    }
  }

  test("BlockGroup-wrapped Blocks are walked like SimpleBlocks") {
    val b = segWith(
      simpleBlock(1, 0, frame(10, 1)),
      blockGroup(1, 40, frame(20, 2)),
      simpleBlock(1, 80, frame(30, 3)))
    val got = blocks(b).sortBy(_.absTsTicks)
    assert(got.map(_.absTsTicks) === Seq(0L, 40L, 80L))
    assert(got.map(_.size) === Seq(10, 20, 30))
    assert(payloadOf(b, got(1)) === frame(20, 2).toSeq)
  }

  test("Chromium shape: unknown-size Segment and Clusters still demux") {
    // MediaRecorder writes Segment and every Cluster with the reserved
    // all-ones 1-byte VINT; cluster boundaries come from the next Cluster ID
    val header = elem(0x1A45DFA3L, selem(0x4282L, "webm"))
    val info = elem(0x1549A966L, uelem(0x2AD7B1L, 1000000L))
    val tracks = elem(0x1654AE6BL,
      elem(0xAEL, uelem(0xD7L, 1), uelem(0x83L, 1), selem(0x86L, "V_VP9")))
    val cluster1 = elemUnknownSize(0x1F43B675L, uelem(0xE7L, 0L),
      simpleBlock(1, 0, frame(10, 1)), simpleBlock(1, 40, frame(11, 2)))
    val cluster2 = elemUnknownSize(0x1F43B675L, uelem(0xE7L, 120L),
      simpleBlock(1, 0, frame(12, 3)))
    val b = cat(header,
      elemUnknownSize(0x18538067L, info, tracks, cluster1, cluster2))
    assert(probe(b).docType === "webm")
    assert(probe(b).tracks.map(_.trackNo) === Seq(1))
    val got = blocks(b).sortBy(_.absTsTicks)
    // the second cluster's base (120) must come from ITS Timestamp element —
    // proof cluster1's unknown size ended at the next Cluster ID, not at EOF
    assert(got.map(_.absTsTicks) === Seq(0L, 40L, 120L))
    assert(got.map(_.size) === Seq(10, 11, 12))
    assert(payloadOf(b, got(2)) === frame(12, 3).toSeq)
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

package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Mp4Demux._

class Mp4DemuxSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fixture = demoFixture()

  test("committed fixture is byte-identical to the muxer's output") {
    val in = getClass.getResourceAsStream("/graft/multimodal/video_demo_64x48.mp4")
    assert(in != null, "fixture not committed — run FixtureGen")
    val committed = try in.readAllBytes() finally in.close()
    assert(committed.sameElements(fixture))
  }

  test("probe reads brand, movie header, and both tracks") {
    val info = probe(fixture)
    assert(info.majorBrand === "isom")
    assert(info.movieTimescale === 1000L)
    assert(info.movieDurationUnits === 1000L)
    assert(info.tracks.map(_.trackId) === Seq(1, 2))
    val vid = info.tracks.head
    assert((vid.handler, vid.codec, vid.width, vid.height) ===
      (("vide", "avc1", 64, 48)))
    assert((vid.timescale, vid.durationUnits, vid.nSamples) ===
      ((1000L, 400L, 10)))
    val aud = info.tracks(1)
    assert((aud.handler, aud.codec, aud.timescale, aud.nSamples) ===
      (("soun", "mp4a", 8000L, 5)))
  }

  test("sample tables expand to exact offsets across interleaved chunks") {
    val byTrack = samples(fixture).groupBy(_.trackId)
    val vid = byTrack(1).sortBy(_.idx)
    assert(vid.map(_.size) === (0 until VidN).map(vidSize))
    assert(vid.map(_.dtsUnits) === (0 until VidN).map(_ * VidDelta))
    // chunk 1 offsets are contiguous from the first; chunk 2 restarts past
    // the audio chunk — the stsc/stco interleave is what's under test
    val off0 = vid.head.offset
    assert(vid(1).offset === off0 + vidSize(0))
    assert(vid(VidChunk1).offset ===
      off0 + (0 until VidChunk1).map(vidSize).sum + AudN * AudSize)
    val aud = byTrack(2).sortBy(_.idx)
    assert(aud.map(_.size).distinct === Seq(AudSize)) // uniform stsz branch
    assert(aud.head.offset === off0 + (0 until VidChunk1).map(vidSize).sum)
    // every sample's payload bytes are its closed-form fill value
    for (s <- vid)
      assert(fixture(s.offset.toInt) === vidFill(s.idx))
    for (s <- aud)
      assert(fixture((s.offset + s.size - 1).toInt) === audFill(s.idx))
  }

  test("corrupt input: no moov throws; truncated box walk stops clean") {
    intercept[IllegalArgumentException](probe(fixture.take(100)))
    intercept[IllegalArgumentException](samples(
      Array[Byte](0, 0, 0, 9, 'f'.toByte, 'r'.toByte, 'e'.toByte, 'e'.toByte, 1)))
  }

  test("demuxSamples strides per handler and never shuffles the bytes") {
    val media = Seq((7L, fixture)).toDS()
    val rows = demuxSamples(media, videoStride = 3, audioStride = 2)
      .collect().sortBy(r => (r.track_id, r.sample_idx))
    assert(rows.filter(_.kind == "video").map(_.sample_idx).toSeq ===
      Seq(0, 3, 6, 9))
    assert(rows.filter(_.kind == "audio").map(_.sample_idx).toSeq ===
      Seq(0, 2, 4))
    val v3 = rows.find(r => r.kind == "video" && r.sample_idx == 3).get
    assert(v3.payload_mean === (40 + 13 * 3).toDouble)
    assert(v3.dts_ms === 120L)
    assert(rows.forall(_.media_id === 7L))
    // narrow stage: the demux plan must contain no shuffle exchange
    val plan = demuxSamples(media, 3, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}

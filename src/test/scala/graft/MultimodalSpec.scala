package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaFeature, MediaMeta, MediaRow}

/** Multimodal plumbing: schema round-trip, stub determinism, frame
  * sampling shape. The decode itself is stubbed (no media libs in this
  * environment) — these tests pin the distributed contract around it. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array[Byte](1, 2, 3, 4, 5)),
    MediaRow(2L, "video", Array.tabulate(1000)(_.toByte)),
    MediaRow(3L, "audio", Array[Byte]())
  ).toDS()

  test("extractMeta: deterministic stub metadata, one row per payload") {
    val out = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.map(_.n_bytes).toSeq == Seq(5L, 1000L, 0L))
    // determinism: same payload -> same fake dims on every run
    val again = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
    assert(out.forall(m => m.width >= 64 && m.height >= 64 && m.n_frames >= 1))
  }

  test("imageDims: real PNG and JPEG headers parse to true dimensions") {
    // minimal PNG: signature + IHDR chunk header + width=640, height=480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, /* 640 */ 0, 0, 1, 0xe0 /* 480 */).map(_.toByte)
    assert(Multimodal.imageDims(png).contains((640, 480)))

    // minimal JPEG: SOI, APP0 (16 bytes), SOF0 with height=333 width=221
    val jpeg = (Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0) ++
      Array[Int](0xff, 0xc0, 0x00, 0x11, 8,
        0x01, 0x4d, /* h=333 */ 0x00, 0xdd /* w=221 */) ++
      Array.fill(12)(0)).map(_.toByte)
    assert(Multimodal.imageDims(jpeg).contains((221, 333)))

    // non-image payloads fall back to None (then the stub)
    assert(Multimodal.imageDims("plain text".getBytes).isEmpty)
    assert(Multimodal.imageDims(Array[Byte]()).isEmpty)

    // a stream that reaches SOS without a frame header must give up —
    // reading entropy-coded bytes as segment lengths yields garbage.
    // 0xff 0xc0 here is COMPRESSED DATA after SOS, not a real SOF
    val sosFirst = (Array[Int](0xff, 0xd8,
      0xff, 0xda, 0x00, 0x04, 0x01, 0x00) ++
      Array[Int](0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x4d, 0x00, 0xdd) ++
      Array.fill(12)(0)).map(_.toByte)
    assert(Multimodal.imageDims(sosFirst).isEmpty)
    // EOI straight after SOI: empty stream, no dimensions
    val eoiOnly = (Array[Int](0xff, 0xd9, 0x00, 0x00, 0x00) ++
      Array.fill(10)(0)).map(b => b.toByte)
    assert(Multimodal.imageDims(
      (Array[Int](0xff, 0xd8) ++ eoiOnly.map(_.toInt & 0xff)).map(_.toByte)).isEmpty)

    // and extractMeta surfaces the REAL dimensions for real headers
    val rows = Seq(MediaRow(9L, "image", png)).toDS()
    val meta = Multimodal.extractMeta(rows).collect().head
    assert(meta.width == 640 && meta.height == 480 && meta.n_frames == 1)
  }

  private def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Long) = Seq((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
    ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
  private def be32(v: Long) = Seq(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
    ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
  private def cc(s: String) = s.getBytes("US-ASCII").map(_.toInt & 0xff).toSeq

  // stereo 16-bit 44100 Hz PCM, declared data size = 1 second of audio
  private def wavBytes: Array[Byte] = {
    val dataBytes = 44100L * 2 * 2
    (cc("RIFF") ++ le32(36 + dataBytes) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100L * 4) ++ le16(4) ++ le16(16) ++
      cc("data") ++ le32(dataBytes)).map(_.toByte).toArray
  }

  // ftyp(isom) + moov{ mvhd v0 (timescale 600, duration 1200),
  //                    trak{ tkhd v0 (640x360 as 16.16 fixed) } }
  private def mp4Bytes: Array[Byte] = {
    val mvhd = be32(28) ++ cc("mvhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(1200)
    val tkhdPayload = be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
      be32(0) ++ Seq.fill(8)(0) ++ Seq.fill(8)(0) ++ Seq.fill(36)(0) ++
      be32(640L << 16) ++ be32(360L << 16)
    val tkhd = be32(8 + tkhdPayload.length) ++ cc("tkhd") ++ tkhdPayload
    val trak = be32(8 + tkhd.length) ++ cc("trak") ++ tkhd
    val moov = be32(8 + mvhd.length + trak.length) ++ cc("moov") ++ mvhd ++ trak
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200)
    (ftyp ++ moov).map(_.toByte).toArray
  }

  private def gifBytes: Array[Byte] =
    (cc("GIF89a") ++ le16(320) ++ le16(200)).map(_.toByte).toArray

  test("wavInfo: RIFF chunk walk yields PCM shape and duration") {
    val w = Multimodal.wavInfo(wavBytes)
    assert(w.contains(Multimodal.WavInfo(2, 44100, 16, Some(1000L))))
    // fmt intact but data chunk missing: shape known, duration unknown
    val noData = wavBytes.take(36)
    assert(Multimodal.wavInfo(noData).contains(
      Multimodal.WavInfo(2, 44100, 16, None)))
    // RIFF but not WAVE (e.g. AVI) and truncated junk are rejected
    val avi = wavBytes.clone(); "AVI ".getBytes.copyToArray(avi, 8)
    assert(Multimodal.wavInfo(avi).isEmpty)
    assert(Multimodal.wavInfo("RIFF".getBytes).isEmpty)
    // a malformed chunk declaring a near-Int.MaxValue size must stop
    // the walk cleanly (never overflow into a negative array index)
    val evil = (cc("RIFF") ++ le32(100) ++ cc("WAVE") ++
      cc("junk") ++ le32(0x7ffffff0L) ++
      cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100L * 4) ++ le16(4) ++ le16(16)).map(_.toByte).toArray
    assert(Multimodal.wavInfo(evil).isEmpty) // fmt sits past the bogus chunk
  }

  test("mp4Info: box walk yields brand, duration, and track dims") {
    val m = Multimodal.mp4Info(mp4Bytes)
    assert(m.contains(Multimodal.Mp4Info("isom", Some(2000L),
      Some(640), Some(360))))
    // ftyp alone: brand known, nothing else claimed
    assert(Multimodal.mp4Info(mp4Bytes.take(16)).contains(
      Multimodal.Mp4Info("isom", None, None, None)))
    // not an MP4 (no leading ftyp)
    assert(Multimodal.mp4Info("plain text file content".getBytes).isEmpty)
  }

  test("probe: magic-dispatch over mixed media, unknown never fabricates") {
    val rows = Seq(
      MediaRow(1L, "audio", wavBytes),
      MediaRow(2L, "video", mp4Bytes),
      MediaRow(3L, "image", gifBytes),
      MediaRow(4L, "other", "just some text".getBytes)
    ).toDS()
    val out = Multimodal.probe(rows).collect().map(p => p.media_id -> p).toMap
    assert(out(1L).container == "wav")
    assert(out(1L).sample_rate.contains(44100) && out(1L).channels.contains(2)
      && out(1L).duration_ms.contains(1000L))
    assert(out(2L).container == "mp4" && out(2L).brand.contains("isom"))
    assert(out(2L).width.contains(640) && out(2L).height.contains(360)
      && out(2L).duration_ms.contains(2000L))
    assert(out(3L).container == "gif"
      && out(3L).width.contains(320) && out(3L).height.contains(200))
    assert(out(4L).container == "unknown")
    assert(out(4L).productIterator.count(_ == None) == 7,
      "unknown container must leave every optional field absent")
    assert(out.values.forall(p => p.n_bytes > 0))
  }

  test("frameFeatures: stride sampling yields ceil(frames/stride) rows, fixed dim") {
    val metas = Multimodal.extractMeta(media).collect()
      .map(m => m.media_id -> m.n_frames).toMap
    val out = Multimodal.frameFeatures(media, stride = 2).collect()
    val byId = out.groupBy(_.media_id)
    metas.foreach { case (id, frames) =>
      assert(byId(id).length == (frames + 1) / 2)
    }
    assert(out.forall(_.feature.length == 8))
    // frame ids are the sampled ones
    assert(byId(1L).map(_.frame_id).sorted.toSeq ==
      (0 until metas(1L) by 2).toSeq)
  }

  test("fromBinaryColumn: text bytes -> payloads with stable ids") {
    val df = Seq((7L, "hello")).toDF("doc_id", "text")
    val rows = Multimodal.fromBinaryColumn(df, "doc_id", "text", "image")
      .as[MediaRow].collect()
    assert(rows.length == 1 && rows(0).media_id == 7L)
    assert(new String(rows(0).payload, "UTF-8") == "hello")
  }

  test("resize: images re-probe at target dims with area-scaled bodies; rest pass through") {
    import spark.implicits._
    val body = ("x" * 600).getBytes("UTF-8")
    // ids 0-3 cycle png/gif/wav/mp4 in syntheticPayload
    val media = spark.createDataset((0L to 3L).map(id =>
      Multimodal.MediaRow(id, "synth", Multimodal.syntheticPayload(id, body))))
    val before = Multimodal.probe(media).collect().map(r => r.media_id -> r).toMap
    val out = Multimodal.probe(Multimodal.resize(media, 64, 48))
      .collect().map(r => r.media_id -> r).toMap
    // png id=0: source dims 16x16 -> target read back, body scaled by
    // 3072/256 = 12x (600 -> 7200), header 24
    assert(out(0L).container == "png" &&
      out(0L).width.contains(64) && out(0L).height.contains(48))
    assert(out(0L).n_bytes == 24L + 600L * 3072 / (16 * 16))
    // gif id=1: 17x17 source; floor(600*3072/289) + 10-byte header
    assert(out(1L).container == "gif" &&
      out(1L).width.contains(64) && out(1L).height.contains(48))
    assert(out(1L).n_bytes == 10L + 600L * 3072 / (17 * 17))
    // wav/mp4: bit-identical pass-through
    assert(out(2L) == before(2L) && out(3L) == before(3L))
    // unknown bytes pass through; empty image body stays empty
    val odd = spark.createDataset(Seq(
      Multimodal.MediaRow(10L, "synth", "plain text".getBytes("UTF-8")),
      Multimodal.MediaRow(11L, "synth",
        Multimodal.syntheticPayload(0L, Array.emptyByteArray))))
    val odd2 = Multimodal.resize(odd, 64, 48).collect().map(r => r.media_id -> r).toMap
    assert(new String(odd2(10L).payload, "UTF-8") == "plain text")
    assert(odd2(11L).payload.length == 24, "empty body must stay empty after the header")
    // deterministic: same input, same bytes
    val again = Multimodal.resize(media, 64, 48).collect().map(r => r.media_id -> r.payload).toMap
    val first = Multimodal.resize(media, 64, 48).collect().map(r => r.media_id -> r.payload).toMap
    assert(again.forall { case (k, v) => java.util.Arrays.equals(v, first(k)) })
  }
}

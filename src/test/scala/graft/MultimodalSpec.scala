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
}

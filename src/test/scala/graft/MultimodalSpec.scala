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

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * (image/audio/video) ride through the engine as opaque `binary`
  * columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run per-partition over the typed Dataset —
  * the Scala analogue of a batched `mapInPandas` stage: one
  * decoder-library initialization per partition (not per row), rows
  * streamed through it in batch.
  *
  * Metadata decode is REAL for PNG and JPEG: dimensions come from the
  * container headers ([[imageDims]] — pure byte inspection, no codec
  * library). PIXEL decode and the frame/feature extractors are STUBBED
  * (this container ships no media libraries): `decodeStub` derives
  * deterministic fake values from the payload bytes for formats the
  * header parser doesn't know. Everything around the stub — schema,
  * encoders, partitioning, batch shape, the feature pipeline — is real
  * and tested; swapping it for javacpp-ffmpeg/ImageIO is a
  * one-function change inside the partition loop.
  *
  * Scale: payloads never shuffle — decode is map-side, features (small)
  * are what downstream joins/aggregations move. `repartition` before
  * decode controls task granularity so one task holds a bounded number
  * of payloads in memory.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int)
  case class MediaFeature(media_id: Long, frame_id: Int,
                          feature: Array[Float])

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * Replace the body with a real codec call; the signature — bytes in,
    * (width, height, frames) out — is the real decode contract. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(payload.length, 256)) {
      h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val frames = 1 + (math.abs(h >> 20) % 16).toInt
    (w, ht, frames)
  }

  /** Real image-dimension decode from container headers — PNG (IHDR
    * fields at fixed offsets) and JPEG (marker scan to the first SOFn
    * frame segment). Pure byte inspection: correct metadata without a
    * pixel codec. Returns None for anything else (truncated, other
    * formats), letting callers fall back. */
  def imageDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      Some((be32(16), be32(20)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk segments until a start-of-frame marker (C0-CF minus
      // the non-frame C4/C8/CC); height/width sit after the precision byte
      var i = 2
      while (i + 9 < p.length && u8(i) == 0xff) {
        // legal 0xFF fill bytes may pad before any marker — skip them
        var j = i + 1
        while (j + 8 < p.length && u8(j) == 0xff) j += 1
        val m = u8(j)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some((be16(j + 6), be16(j + 4)))
        // SOS starts entropy-coded data and EOI ends the stream: past
        // either there is no frame header, and reading on would treat
        // compressed bytes as segment lengths — garbage dimensions
        if (m == 0xda || m == 0xd9) return None
        i = j + 1 +
          (if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) 0
           else be16(j + 1))
      }
      None
    } else None
  }

  /** Decode metadata for every payload, one decoder init per partition:
    * real header dimensions for PNG/JPEG, deterministic stub otherwise. */
  def extractMeta(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // real impl: initialize the pixel codec once here, per partition
      it.map { r =>
        val (w, h, f) = imageDims(r.payload) match {
          case Some((pw, ph)) => (pw, ph, 1)
          case None => decodeStub(r.payload)
        }
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong, w, h, f)
      }
    }
  }

  /** Frame-sample a "video" payload: every `stride`-th frame, features
    * extracted per frame (stub: 8-dim hash-derived vector). */
  def frameFeatures(rows: Dataset[MediaRow], stride: Int): Dataset[MediaFeature] = {
    require(stride > 0, s"frameFeatures: stride must be positive, got $stride")
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val (_, _, frames) = decodeStub(r.payload)
        (0 until frames by stride).map { fi =>
          val feat = new Array[Float](8)
          var h = 0x100000001b3L * (fi + 1)
          var i = 0
          while (i < 8) {
            h ^= r.media_id + i; h *= 0x100000001b3L
            feat(i) = ((h % 1000L).toFloat) / 1000.0f
            i += 1
          }
          MediaFeature(r.media_id, fi, feat)
        }
      }
    }
  }

  /** Build a media table from any binary-able column (for tests and the
    * demo query: text bytes stand in for media payloads). */
  def fromBinaryColumn(df: DataFrame, id: String, bin: String,
                       kind: String): DataFrame = {
    // MediaRow.media_id is non-nullable: a lossy cast (non-numeric
    // string id) would surface as a deep-in-the-job encoder crash
    val idType = df.schema(id).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"fromBinaryColumn: id column '$id' must be numeric, got $idType")
    // rows with a NULL id or payload are dropped here, at the plan
    // boundary: MediaRow.media_id is non-nullable and the decode
    // kernels dereference the payload, so either null would otherwise
    // surface as an encoder crash or NPE deep inside a task
    df.filter(col(id).isNotNull && col(bin).isNotNull)
      .select(col(id).cast("long").as("media_id"), lit(kind).as("kind"),
        col(bin).cast("binary").as("payload"))
  }
}

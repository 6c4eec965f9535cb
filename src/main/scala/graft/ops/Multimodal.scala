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
        // real header parses first (PNG/JPEG, then GIF — same parsers
        // probe() dispatches on); the fabricated stub only covers
        // containers no parser understands
        val (w, h, f) = imageDims(r.payload).orElse(gifDims(r.payload)) match {
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

  /** Resize image payloads to (w, h), one codec init per partition —
    * the batched resize stage of a multimodal pipeline. The PIXEL
    * kernel is a STUB (this container ships no codec libraries), but
    * everything a real resize hands downstream is honest: the container
    * magic is re-detected with the same parsers [[probe]] dispatches
    * on, the header is rebuilt around the TARGET dimensions (a
    * re-probe reads w×h back out), and the byte body is deterministic
    * stride-resampled to the area-scaled length, so size accounting
    * behaves like a real re-encode. PNG and GIF are re-headered;
    * everything else (audio/video containers, JPEG's variable-offset
    * SOFn, unknown bytes) passes through UNCHANGED — a resize never
    * fabricates. Stub boundary: the body is taken as everything after
    * the fixed header prefix (the synthetic-payload shape); a real
    * codec swap replaces `scaledBody` + the re-headering with the
    * encode call. */
  def resize(rows: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    // upper bound serves three invariants at once: GIF's logical screen
    // is u16 (a larger target would silently truncate), the scaled-body
    // length stays far from Int wrap, and no stub ever allocates a
    // pathological buffer
    require(w > 0 && h > 0 && w <= 8192 && h <= 8192,
      s"resize: target dims must be in [1, 8192], got ${w}x$h")
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // real impl: initialize the pixel codec once here, per partition
      def scaledBody(body: Array[Byte], w0: Int, h0: Int): Array[Byte] = {
        if (body.isEmpty || w0 <= 0 || h0 <= 0) return body
        // cap guards the Int conversion against absurd blow-up factors
        // (tiny source raster, huge target) — a real encoder bounds its
        // own output; the stub must not wrap negative instead
        val n = math.min(1L << 27,
          math.max(1L, body.length.toLong * w * h / (w0.toLong * h0))).toInt
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          out(i) = body((i.toLong * body.length / n).toInt); i += 1
        }
        out
      }
      it.map { r =>
        val p = r.payload
        def u8(i: Int) = p(i) & 0xff
        val resized =
          if (p.length >= 24 && u8(0) == 0x89 && p(1) == 'P')
            imageDims(p).map { case (w0, h0) =>
              pngSig ++ be32(13) ++ cc("IHDR") ++ be32(w) ++ be32(h) ++
                scaledBody(p.drop(24), w0, h0)
            }
          else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
            gifDims(p).map { case (w0, h0) =>
              p.take(6) ++ le16(w) ++ le16(h) ++ scaledBody(p.drop(10), w0, h0)
            }
          else None
        resized.fold(r)(bytes => r.copy(payload = bytes))
      }
    }
  }

  /** Audio/video container probe results. All fields except identity
    * and byte count are per-container optional: images carry dims,
    * audio carries the PCM shape, video carries brand + duration + dims. */
  case class MediaProbe(media_id: Long, n_bytes: Long, container: String,
                        width: Option[Int], height: Option[Int],
                        channels: Option[Int], sample_rate: Option[Int],
                        bits_per_sample: Option[Int],
                        duration_ms: Option[Long], brand: Option[String])

  case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                     durationMs: Option[Long])
  case class Mp4Info(brand: String, durationMs: Option[Long],
                     width: Option[Int], height: Option[Int])

  /** Real WAV (RIFF/WAVE) header decode: chunk walk to `fmt ` for the
    * PCM shape and `data` for the payload size → duration. Pure byte
    * inspection of the container, no codec. Chunk sizes are little-
    * endian and chunks pad to even offsets per the RIFF spec; a
    * truncated file still yields the fmt info if that chunk is intact
    * (duration absent without `data`). */
  def wavInfo(p: Array[Byte]): Option[WavInfo] = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def fourCC(i: Int) = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 12 || fourCC(0) != "RIFF" || fourCC(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes: Option[Long] = None
    var walk = true
    while (walk && i + 8 <= p.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val id = fourCC(i)
      val size = le32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= p.length)
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
      // the data chunk's DECLARED size is the payload length — the
      // bytes themselves need not be present to know the duration
      if (id == "data") dataBytes = Some(size)
      // next chunk offset in LONG arithmetic: a malformed/giant declared
      // size must stop the walk, never overflow Int into a negative
      // index (chunks pad to even per the RIFF spec)
      val next = i.toLong + 8L + size + (size & 1L)
      if (next > p.length) walk = false else i = next.toInt
    }
    fmt.map { case (ch, sr, bits) =>
      val dur = dataBytes.flatMap { db =>
        val bytesPerSec = sr.toLong * ch * bits / 8
        if (bytesPerSec > 0) Some(db * 1000L / bytesPerSec) else None
      }
      WavInfo(ch, sr, bits, dur)
    }
  }

  /** Real MP4 (ISO BMFF) metadata decode: top-level box walk for `ftyp`
    * (major brand) and `moov`, then one level into `moov` for `mvhd`
    * (timescale + duration → ms) and each `trak`'s `tkhd` (16.16 fixed
    * presentation width/height — the first track with nonzero dims is
    * the video track). Handles 64-bit `largesize` boxes and both mvhd/
    * tkhd versions. */
  def mp4Info(p: Array[Byte]): Option[Mp4Info] = {
    def u8(i: Int) = p(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
      (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def be64(i: Int) = (be32(i) << 32) | be32(i + 4)
    def fourCC(i: Int) = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk boxes in [from, until): (type, headerLen, payloadStart, boxEnd)
    def boxes(from: Int, until: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var i = from
        def hasNext: Boolean = i + 8 <= until
        def next(): (String, Int, Int) = {
          val size32 = be32(i)
          val typ = fourCC(i + 4)
          val (hdr, size) =
            if (size32 == 1 && i + 16 <= until) (16, be64(i + 8))
            else if (size32 == 0) (8, (until - i).toLong) // box runs to end
            else (8, size32)
          val end = if (size < 8 || i + size > until) until
                    else (i + size).toInt
          val res = (typ, i + hdr, end)
          i = end
          res
        }
      }
    if (p.length < 8) return None
    val top = boxes(0, p.length).toSeq
    // an MP4 without ftyp first is not one we claim to understand
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    val (_, ftypStart, ftypEnd) = top.head
    if (ftypStart + 4 > ftypEnd) return None
    val brand = fourCC(ftypStart)
    var durMs: Option[Long] = None
    var dims: Option[(Int, Int)] = None
    top.find(_._1 == "moov").foreach { case (_, ms, me) =>
      boxes(ms, me).foreach {
        case ("mvhd", bs, be) =>
          val v = u8(bs)
          // v0: ver/flags(4) ctime(4) mtime(4) -> timescale @+12, dur u32 @+16
          // v1: ver/flags(4) ctime(8) mtime(8) -> timescale @+20, dur u64 @+24
          val (ts, dur) =
            if (v == 1 && bs + 32 <= be) (be32(bs + 20), be64(bs + 24))
            else if (v == 0 && bs + 20 <= be) (be32(bs + 12), be32(bs + 16))
            else (0L, 0L)
          if (ts > 0) durMs = Some(dur * 1000L / ts)
        case ("trak", ts_, te) if dims.isEmpty =>
          boxes(ts_, te).foreach {
            case ("tkhd", bs, be) if dims.isEmpty =>
              val v = u8(bs)
              // offsets from the PAYLOAD start (after size+type):
              // v0: verflags4 +ctime4 mtime4 id4 res4 dur4 +res8
              //     +layer2 alt2 vol2 res2 +matrix36 -> width @+76
              // v1: 8-byte times and duration -> width @+88
              val off = if (v == 1) 88 else 76
              if (bs + off + 8 <= be) {
                val w = (be32(bs + off) >> 16).toInt     // 16.16 fixed
                val h = (be32(bs + off + 4) >> 16).toInt
                if (w > 0 && h > 0) dims = Some((w, h))
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    Some(Mp4Info(brand, durMs, dims.map(_._1), dims.map(_._2)))
  }

  /** GIF logical-screen dimensions (87a/89a): little-endian u16 pair
    * right after the 6-byte signature. */
  def gifDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      Some((u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
    else None
  }

  /** Container-dispatching metadata probe over a media table: magic
    * bytes pick the parser (PNG/JPEG/GIF dims, WAV PCM shape + duration,
    * MP4 brand + duration + track dims); anything unrecognized is
    * reported as `unknown` with only its byte count — never a fabricated
    * value. Map-side only: payloads never shuffle, the probe rows are
    * tiny. */
  def probe(rows: Dataset[MediaRow]): Dataset[MediaProbe] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val p = r.payload
        def none = MediaProbe(r.media_id, p.length.toLong, "unknown",
          None, None, None, None, None, None, None)
        def u8(i: Int) = p(i) & 0xff
        if (p.length >= 4 && u8(0) == 0x89 && p(1) == 'P')
          imageDims(p).fold(none.copy(container = "png"))(d =>
            none.copy(container = "png", width = Some(d._1), height = Some(d._2)))
        else if (p.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8)
          imageDims(p).fold(none.copy(container = "jpeg"))(d =>
            none.copy(container = "jpeg", width = Some(d._1), height = Some(d._2)))
        else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
          gifDims(p).fold(none.copy(container = "gif"))(d =>
            none.copy(container = "gif", width = Some(d._1), height = Some(d._2)))
        else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F')
          wavInfo(p).fold(none)(w => none.copy(container = "wav",
            channels = Some(w.channels), sample_rate = Some(w.sampleRate),
            bits_per_sample = Some(w.bitsPerSample), duration_ms = w.durationMs))
        else if (p.length >= 12 && fourCCIs(p, 4, "ftyp"))
          mp4Info(p).fold(none)(m => none.copy(container = "mp4",
            width = m.width, height = m.height, duration_ms = m.durationMs,
            brand = Some(m.brand)))
        else none
      }
    }
  }

  private def fourCCIs(p: Array[Byte], i: Int, s: String): Boolean =
    p.length >= i + 4 && p(i) == s(0) && p(i + 1) == s(1) &&
      p(i + 2) == s(2) && p(i + 3) == s(3)

  // ONE copy of the header byte-packers, shared by syntheticPayload and
  // resize: the header bytes resize emits must stay bit-identical to
  // what the payload builder emits (the oracle round trip hashes them),
  // so duplicated packers are exactly where a one-sided edit would
  // break the gate.
  private def le16(v: Int) =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long) =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Long) =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def cc(sx: String) =
    sx.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val pngSig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
    'G'.toByte, 0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)

  /** Deterministic synthetic media payload for the demo/bench key: REAL
    * container headers (the probe parses them exactly like files from a
    * crawl) around caller-supplied body bytes. `id % 4` picks the
    * container; all parameters derive from `id`, so a replay is
    * byte-identical. This is demo-data generation, not a decode stub —
    * the parsing it exercises is the real thing. */
  def syntheticPayload(id: Long, body: Array[Byte]): Array[Byte] = {
    // floorMod like the container selector: raw % on a negative id
    // would serialize negative dims as wrapped u16/u32 fields
    val w = 16 + math.floorMod(id, 640).toInt
    val h = 16 + math.floorMod(id, 360).toInt
    (math.floorMod(id, 4): @unchecked) match {
      case 0 => // PNG signature + IHDR dims
        pngSig ++ be32(13) ++ cc("IHDR") ++ be32(w) ++ be32(h) ++ body
      case 1 => // GIF logical screen
        cc("GIF89a") ++ le16(w) ++ le16(h) ++ body
      case 2 => // WAV: 16-bit mono 8 kHz PCM, data size = body length
        cc("RIFF") ++ le32(36L + body.length) ++ cc("WAVE") ++ cc("fmt ") ++
          le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
          le16(2) ++ le16(16) ++ cc("data") ++ le32(body.length) ++ body
      case 3 => // MP4: ftyp(isom) + moov{mvhd ts=600, dur=600*(1+id%30)}
        val mvhd = be32(28) ++ cc("mvhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(600) ++ be32(600L * (1 + math.floorMod(id, 30)))
        be32(16) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
          be32(8L + mvhd.length) ++ cc("moov") ++ mvhd ++ body
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

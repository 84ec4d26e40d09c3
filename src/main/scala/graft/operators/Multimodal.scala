package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.4 X4): media payloads travel as
  * opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs partition-parallel over the binary payloads.
  *
  * Header DECODE is real: [[parseImageHeader]] reads width/height/
  * channels from actual PNG (RFC 2083 §4.1.1 IHDR) and JPEG (ITU-T T.81
  * §B.2.2 SOF) bytes with a pure-JVM marker scan — no codec dependency.
  * PIXEL decode is real too: [[decodeImagePixels]]/[[decodeImages]]
  * fully decompress PNG/JPEG/GIF/BMP through `javax.imageio` (in the
  * JDK), and [[encodePng]] is a genuine zlib+CRC PNG writer. Below the
  * codec layer sit three codec-FREE byte-level operators —
  * [[byteProfile]], [[resampleBytes]], [[frameSampleStub]] — the cheap
  * pre-decode triage pass (size/kind/byte-mean gating, fixed-stride
  * chunking) a 100 TB media sweep runs BEFORE paying for real decode;
  * they are deterministic pure byte arithmetic, oracle-replayable, and
  * share the exact typed-`mapPartitions` shape a codec call drops into
  * (one decoder instance per partition — [[decodeImages]] is that same
  * shape with `javax.imageio` in the loop). `frameSampleStub` keeps its
  * STUB marker: a real demuxer walks the container's sample table
  * ([[parseMp4SampleTable]]) rather than assuming fixed-size frames.
  */
object Multimodal {

  /** Typed media row: payload + sidecar metadata, the X4 column model. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], kind: String)

  /** Byte-level payload features from [[byteProfile]]. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double)

  /** Attach a fake binary payload column derived from a text column
    * (UTF-8 bytes) plus a `kind` tag — stands in for real image/audio
    * bytes so the pipeline shape is testable. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      when(length(col(textCol)) % 2 === 0, "image").otherwise("audio")
        .as("kind"))

  /** Deterministic byte statistics: nominal (width, height) from the
    * byte count (a stable hash-bucket pair, NOT pixel dimensions — use
    * [[parseImageHeader]] for those) and the payload's mean byte value
    * (the flat-payload / constant-filler tell). Pure byte arithmetic —
    * no codec, replayable in SQL. */
  private def byteStats(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val mean = if (n == 0) 0.0
      else payload.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / n
    (width, height, mean)
  }

  /** Codec-free payload profile — the pre-decode triage pass: size,
    * kind, [[byteStats]] per payload, partition-parallel over the
    * binary column. At media-corpus scale this is the cheap first
    * sweep that gates which payloads earn a real decode
    * ([[decodeImages]] — same typed-`mapPartitions` shape with
    * `javax.imageio` in the loop). */
  def byteProfile(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaFeatures] =
      Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition setup: a real codec initializes once here
      rows.map { r =>
        val (w, h, mean) = byteStats(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, w, h, mean)
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Nearest-neighbor byte resample to exactly `outBytes` bytes — the
    * 1-D resampling primitive (fixed-width payload normalization for
    * hashing/bucketing). This operates on RAW bytes by design; resizing
    * decoded IMAGES is [[resizeBmp]]'s job (decode → pixel resample →
    * re-encode). */
  def resampleBytes(media: Dataset[MediaRecord], outBytes: Int)
      : Dataset[MediaRecord] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaRecord] =
      Encoders.product[MediaRecord]
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val out =
          if (n == 0) Array.empty[Byte]
          else Array.tabulate(outBytes)(i => r.payload((i.toLong * n
            / outBytes).toInt))
        MediaRecord(r.doc_id, out, r.kind)
      }
    }
  }

  /** STUB — sample every `everyN`-th fixed-size frame from a payload
    * treated as concatenated `frameBytes`-byte frames (the video
    * frame-sampling shape: one row in, many frame rows out — a typed
    * flatMap, Spark's one-to-many plumbing for codecs). Trailing partial
    * frames are dropped, like a real demuxer. */
  def frameSampleStub(media: Dataset[MediaRecord], frameBytes: Int,
      everyN: Int): Dataset[Frame] = {
    implicit val enc: org.apache.spark.sql.Encoder[Frame] =
      Encoders.product[Frame]
    media.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by everyN).map { f =>
        Frame(r.doc_id, f,
          r.payload.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** Parsed image header: null columns ⇔ the payload is not a
    * well-formed PNG/JPEG (the malformed-payload contract — a corrupt
    * crawl byte-blob must yield nulls, never throw). */
  case class ImageHeader(doc_id: Long, format: Option[String],
      width: Option[Int], height: Option[Int], channels: Option[Int])

  /** REAL image header parse — pure JVM, no codec library:
    *
    *  - PNG (RFC 2083): 8-byte signature, then the IHDR chunk is
    *    mandated first, so width/height are the big-endian u32s at
    *    bytes 16/20 and the color type at byte 25 maps to channel
    *    count (0 gray→1, 2 RGB→3, 3 palette→1, 4 gray+α→2, 6 RGBA→4).
    *  - JPEG (ITU-T T.81 §B.2.2): SOI then a marker-segment scan —
    *    each segment is 0xFF, marker byte, u16 length (inclusive of
    *    itself) — until a start-of-frame marker (0xC0–0xCF minus the
    *    non-frame 0xC4/C8/CC); the SOF payload carries precision u8,
    *    height u16, width u16, component count u8. The scan skips
    *    fill bytes and length-less RST/TEM markers, and gives up at
    *    SOS/EOI (a frame header after the scan data is not valid).
    *  - GIF (87a/89a): logical-screen width/height as u16 LITTLE-
    *    endian at bytes 6/8; palette-based, so channels reports 1
    *    (the PNG color-type-3 convention).
    *  - BMP (BITMAPINFOHEADER and successors): 'BM' + u32le DIB
    *    header size at 14 (≥ 40), i32le width/height at 18/22 (a
    *    negative height is a legal top-down bitmap — reported
    *    absolute), u16le bit count at 28 → channels (≤8-bit palette
    *    forms report 1, 24 → 3, 32 → 4).
    *
    * Returns None for anything malformed: wrong signature, truncated
    * header, zero dimensions, unknown color type. Never throws. */
  def parseImageHeader(p: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        new String(p.slice(12, 16), "US-ASCII") == "IHDR") {
      val w = u32(16); val h = u32(20)
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0
      }
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue &&
        channels > 0) Some(("png", w.toInt, h.toInt, channels))
      else None
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res: Option[(String, Int, Int, Int)] = None
      var done = false
      while (!done && i + 1 < p.length) {
        if (u8(i) != 0xff) done = true // desynced: not a marker
        else if (u8(i + 1) == 0xff) i += 1 // fill byte
        else {
          val m = u8(i + 1)
          if (m == 0xd9 || m == 0xda) done = true // EOI / SOS: no frame
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // TEM/RST
          else if (i + 3 >= p.length) done = true // truncated length
          else {
            val len = u16(i + 2)
            val isSof = m >= 0xc0 && m <= 0xcf &&
              m != 0xc4 && m != 0xc8 && m != 0xcc
            if (len < 2) done = true
            else if (isSof) {
              if (len >= 8 && i + 9 < p.length) {
                val h = u16(i + 5); val w = u16(i + 7); val nc = u8(i + 9)
                if (w > 0 && h > 0 && nc > 0)
                  res = Some(("jpeg", w, h, nc))
              }
              done = true
            } else i += 2 + len
          }
        }
      }
      res
    } else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
        u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      val w = u16le(6); val h = u16le(8)
      if (w > 0 && h > 0) Some(("gif", w, h, 1)) else None
    } else if (p.length >= 30 && u8(0) == 'B' && u8(1) == 'M') {
      def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def i32le(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val dibSize = i32le(14)
      val w = i32le(18); val h = i32le(22)
      val bits = u16le(28)
      val channels = bits match {
        case 1 | 4 | 8 => 1; case 24 => 3; case 32 => 4; case _ => 0
      }
      if (dibSize >= 40 && w > 0 && h != 0 && h != Int.MinValue &&
        channels > 0) Some(("bmp", w, math.abs(h), channels))
      else None
    } else None
  }

  /** Partition-parallel REAL header decode over binary payloads: one
    * [[ImageHeader]] row per media row, nulls for malformed bytes. The
    * same mapPartitions shape as [[byteProfile]] but the parse is the
    * genuine article — this is the operator a crawl-ingest pipeline
    * runs to size-filter images before paying for pixel decode. */
  def decodeImageHeaders(media: Dataset[MediaRecord]): Dataset[ImageHeader] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageHeader] =
      Encoders.product[ImageHeader]
    media.mapPartitions { rows =>
      rows.map { r =>
        parseImageHeader(r.payload) match {
          case Some((f, w, h, c)) =>
            ImageHeader(r.doc_id, Some(f), Some(w), Some(h), Some(c))
          case None => ImageHeader(r.doc_id, None, None, None, None)
        }
      }
    }
  }

  /** Parsed audio header: null columns ⇔ not a well-formed WAV (the
    * same malformed-payload contract as [[ImageHeader]]). */
  case class AudioHeader(doc_id: Long, format: Option[String],
      channels: Option[Int], sample_rate: Option[Int],
      bits_per_sample: Option[Int], n_samples: Option[Long])

  /** REAL WAV header parse — RIFF chunk scan (RIFF1991/MSDN WAVE
    * format): 'RIFF' + size + 'WAVE', then little-endian chunks
    * (id u32, size u32, data, word-aligned — odd sizes carry a pad
    * byte) until both 'fmt ' (audio format 1=PCM/3=float, channels,
    * sample rate, block align, bits) and 'data' (payload size) are
    * seen. Unknown chunks (LIST, INFO, cue) are skipped by declared
    * size, exactly what a demuxer does. `n_samples` = data size /
    * block align. Returns None for wrong signature, truncated or
    * inconsistent headers (block align must equal
    * channels·bits/8), never throws. */
  def parseWavHeader(p: Array[Byte])
      : Option[(Int, Int, Int, Long)] = {
    def u16le(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32le(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
    if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var i = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, ba, bits
      var dataSize: Option[Long] = None
      var bad = false
      while (!bad && (fmt.isEmpty || dataSize.isEmpty) &&
          i + 8 <= p.length) {
        val at = i.toInt
        val id = tag(at)
        val size = u32le(at + 4)
        if (id == "fmt ") {
          if (size < 16 || at + 8 + 16 > p.length) bad = true
          else {
            val audioFormat = u16le(at + 8)
            val ch = u16le(at + 10)
            val rate = u32le(at + 12)
            val ba = u16le(at + 20)
            val bits = u16le(at + 22)
            if ((audioFormat == 1 || audioFormat == 3) && ch > 0 &&
              rate > 0 && rate <= Int.MaxValue && bits > 0 &&
              bits % 8 == 0 && ba == ch * bits / 8)
              fmt = Some((ch, rate.toInt, ba, bits))
            else bad = true
          }
        } else if (id == "data") dataSize = Some(size)
        i += 8 + size + (size % 2) // RIFF chunks are word-aligned
      }
      for ((ch, rate, ba, bits) <- fmt; ds <- dataSize)
        yield (ch, rate, bits, ds / ba)
    }
  }

  /** Partition-parallel REAL WAV header decode — the audio sibling of
    * [[decodeImageHeaders]]: nulls for malformed bytes, duration
    * derivable as `n_samples / sample_rate`. */
  def decodeAudioHeaders(media: Dataset[MediaRecord]): Dataset[AudioHeader] = {
    implicit val enc: org.apache.spark.sql.Encoder[AudioHeader] =
      Encoders.product[AudioHeader]
    media.mapPartitions { rows =>
      rows.map { r =>
        parseWavHeader(r.payload) match {
          case Some((ch, rate, bits, ns)) =>
            AudioHeader(r.doc_id, Some("wav"), Some(ch), Some(rate),
              Some(bits), Some(ns))
          case None =>
            AudioHeader(r.doc_id, None, None, None, None, None)
        }
      }
    }
  }

  /** Parsed video container header: null columns ⇔ not a well-formed
    * ISO-BMFF/MP4 (the malformed-payload contract). `width`/`height`
    * stay null when no visual track exists (audio-only container —
    * still a VALID file, so the other columns populate). */
  case class VideoHeader(doc_id: Long, format: Option[String],
      brand: Option[String], timescale: Option[Long],
      duration_ms: Option[Long], n_tracks: Option[Int],
      width: Option[Int], height: Option[Int])

  /** REAL ISO-BMFF (MP4/MOV, ISO 14496-12) box scan — pure JVM, no
    * codec library:
    *
    *  - The file is a sequence of boxes: u32 BE size + 4cc type;
    *    size 1 ⇒ u64 `largesize` follows (16-byte header), size 0 ⇒
    *    box runs to EOF (last box only). Unknown boxes (`free`,
    *    `mdat`, …) skip by declared size — what every demuxer does.
    *  - `ftyp` carries the major brand (first 4 content bytes).
    *  - `moov` contains `mvhd` (version 0: u32 timescale/duration at
    *    content offsets 12/16; version 1: u32 timescale at 20, u64
    *    duration at 24) and one `trak` per track; each trak's `tkhd`
    *    ends in 16.16 fixed-point width/height (content offsets 76/80
    *    for v0, 88/92 for v1) — non-zero only for visual tracks, so
    *    the first such trak provides the display dimensions.
    *
    * Returns None for anything malformed: bad/overrunning box sizes,
    * trailing bytes that are not a whole box, missing ftyp/moov/mvhd,
    * zero timescale. Never throws.
    * Result: (brand, timescale, durationUnits, nTracks, width?, height?). */
  def parseMp4Header(p: Array[Byte])
      : Option[(String, Long, Long, Int, Option[Int], Option[Int])] = {
    val n = p.length.toLong
    def u8(i: Long): Int = p(i.toInt) & 0xff
    def u32(i: Long): Long =
      // widen BEFORE shifting: (u8 << 24) overflows Int when the top
      // byte has its high bit set, and .toLong would sign-extend it —
      // a >= 2 GiB mdat would read as a negative size (file rejected)
      // and a v0 duration >= 2^31 as a negative duration
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Long): String =
      new String(p.slice(i.toInt, i.toInt + 4), "US-ASCII")
    /** Boxes in [from, to): (type, contentStart, boxEnd); None if the
      * region is not an exact concatenation of well-formed boxes. */
    def scan(from: Long, to: Long): Option[List[(String, Long, Long)]] = {
      var i = from
      val acc = List.newBuilder[(String, Long, Long)]
      while (i + 8 <= to) {
        val sz32 = u32(i)
        val typ = tag(i + 4)
        val (sz, hdr): (Long, Long) =
          if (sz32 == 1L) {
            if (i + 16 > to) return None
            (u64(i + 8), 16L)
          } else if (sz32 == 0L) (to - i, 8L)
          else (sz32, 8L)
        if (sz < hdr || i + sz > to) return None
        acc += ((typ, i + hdr, i + sz))
        i += sz
      }
      if (i != to) None else Some(acc.result())
    }
    val top = scan(0L, n).getOrElse(return None)
    val brand = top.collectFirst { case ("ftyp", cs, be) if be - cs >= 4 =>
      tag(cs)
    }.getOrElse(return None)
    val (moovCs, moovEnd) = top.collectFirst { case ("moov", cs, be) =>
      (cs, be)
    }.getOrElse(return None)
    val kids = scan(moovCs, moovEnd).getOrElse(return None)
    val mvhd = kids.collectFirst { case ("mvhd", cs, be) =>
      if (be - cs >= 4 && u8(cs) == 0 && be - cs >= 20)
        Some((u32(cs + 12), u32(cs + 16)))
      else if (be - cs >= 4 && u8(cs) == 1 && be - cs >= 32)
        Some((u32(cs + 20), u64(cs + 24)))
      else None
    }.flatten.getOrElse(return None)
    val (ts, dur) = mvhd
    if (ts <= 0) return None
    val traks = kids.filter(_._1 == "trak")
    val dims = traks.iterator.flatMap { case (_, cs, be) =>
      scan(cs, be).getOrElse(Nil).collectFirst { case ("tkhd", tc, tb) =>
        val off = if (tb - tc >= 4 && u8(tc) == 1) 88L else 76L
        if (tb - tc >= off + 8) {
          val w = (u32(tc + off) >> 16).toInt
          val h = (u32(tc + off + 4) >> 16).toInt
          if (w > 0 && h > 0) Some((w, h)) else None
        } else None
      }.flatten
    }.take(1).toList.headOption
    Some((brand, ts, dur, traks.size,
      dims.map(_._1), dims.map(_._2)))
  }

  /** Partition-parallel REAL MP4 header decode — the video sibling of
    * [[decodeImageHeaders]]/[[decodeAudioHeaders]]: nulls for
    * malformed bytes, `duration_ms` = units·1000/timescale in exact
    * integer math. This is the operator a video-ingest pipeline runs
    * to length/size-filter clips before paying for frame decode. */
  def decodeVideoHeaders(media: Dataset[MediaRecord]): Dataset[VideoHeader] = {
    implicit val enc: org.apache.spark.sql.Encoder[VideoHeader] =
      Encoders.product[VideoHeader]
    media.mapPartitions { rows =>
      rows.map { r =>
        parseMp4Header(r.payload) match {
          case Some((brand, ts, dur, nt, w, h)) =>
            VideoHeader(r.doc_id, Some("mp4"), Some(brand), Some(ts),
              Some(dur * 1000L / ts), Some(nt), w, h)
          case None =>
            VideoHeader(r.doc_id, None, None, None, None, None, None, None)
        }
      }
    }
  }

  /** One entry of a demuxer frame index: where sample `sample_idx`
    * lives in the container (`offset`/`size` — byte-range addressable
    * without touching mdat) and when it plays (`pts_units` on the
    * track's `timescale`). */
  case class FrameIndexRow(doc_id: Long, sample_idx: Int, chunk_idx: Int,
      offset: Long, size: Long, pts_units: Long, timescale: Long)

  /** REAL ISO-BMFF sample-table walk (ISO 14496-12 §8.6–8.7) — the
    * demuxer index a video pipeline needs to frame-sample WITHOUT a
    * codec: parses the first track whose `stbl` is complete and
    * resolves, per sample, its byte offset, size, and presentation
    * time:
    *
    *  - `stts` (decoding deltas, run-length (count, delta) pairs) →
    *    cumulative pts in track-timescale units;
    *  - `stsc` (chunk map: from `first_chunk`, `samples_per_chunk`
    *    each) → which chunk a sample lives in and its index within;
    *  - `stsz` (constant `sample_size` or per-sample u32s) → sizes,
    *    and within-chunk offsets as their running sum;
    *  - `stco`/`co64` (chunk start offsets, u32/u64) → absolute
    *    positions; the track timescale comes from `mdhd` (v0/v1).
    *
    * Offsets are reported as declared — moov-before-mdat layouts and
    * byte-range fetch plans address samples without the media bytes
    * present. None for malformed tables: missing/truncated boxes,
    * stsz count ≠ stts total, non-increasing `first_chunk` not
    * starting at 1, zero samples-per-chunk, more chunks needed than
    * `stco` declares, zero timescale — or a declared sample count
    * above `maxSamples` (the header-bomb gate: a 100-byte moov can
    * declare 2^32 samples). Never throws. */
  def parseMp4SampleTable(p: Array[Byte], maxSamples: Int = 1000000)
      : Option[(Long, Vector[(Int, Int, Long, Long, Long)])] = {
    val n = p.length.toLong
    def u8(i: Long): Int = p(i.toInt) & 0xff
    def u32(i: Long): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Long): String =
      new String(p.slice(i.toInt, i.toInt + 4), "US-ASCII")
    def scan(from: Long, to: Long): Option[List[(String, Long, Long)]] = {
      var i = from
      val acc = List.newBuilder[(String, Long, Long)]
      while (i + 8 <= to) {
        val sz32 = u32(i)
        val (sz, hdr): (Long, Long) =
          if (sz32 == 1L) {
            if (i + 16 > to) return None
            (u64(i + 8), 16L)
          } else if (sz32 == 0L) (to - i, 8L)
          else (sz32, 8L)
        if (sz < hdr || i + sz > to) return None
        acc += ((tag(i + 4), i + hdr, i + sz))
        i += sz
      }
      if (i != to) None else Some(acc.result())
    }
    def child(boxes: List[(String, Long, Long)], typ: String)
        : Option[(Long, Long)] =
      boxes.collectFirst { case (`typ`, cs, be) => (cs, be) }
    val top = scan(0L, n).getOrElse(return None)
    val (moovCs, moovEnd) = child(top, "moov").getOrElse(return None)
    val kids = scan(moovCs, moovEnd).getOrElse(return None)
    // first trak whose mdia/minf/stbl chain fully parses
    kids.iterator.filter(_._1 == "trak").map { case (_, tc, tb) =>
      for {
        trakKids <- scan(tc, tb)
        (mdCs, mdEnd) <- child(trakKids, "mdia")
        mdiaKids <- scan(mdCs, mdEnd)
        (mhCs, mhEnd) <- child(mdiaKids, "mdhd")
        timescale <- {
          val len = mhEnd - mhCs
          if (len >= 4 && u8(mhCs) == 0 && len >= 20)
            Some(u32(mhCs + 12))
          else if (len >= 4 && u8(mhCs) == 1 && len >= 28)
            Some(u32(mhCs + 20))
          else None
        }
        if timescale > 0
        (mfCs, mfEnd) <- child(mdiaKids, "minf")
        minfKids <- scan(mfCs, mfEnd)
        (sbCs, sbEnd) <- child(minfKids, "stbl")
        stblKids <- scan(sbCs, sbEnd)
        samples <- walkSampleTable(stblKids, maxSamples, u32, u64)
      } yield (timescale, samples)
    }.collectFirst { case Some(x) => x }
  }

  /** Resolves (stts, stsc, stsz, stco/co64) child boxes into the
    * per-sample (idx, chunk, offset, size, pts) vector; None on any
    * inconsistency. Streaming single pass over the sample count. */
  private def walkSampleTable(stbl: List[(String, Long, Long)],
      maxSamples: Int, u32: Long => Long, u64: Long => Long)
      : Option[Vector[(Int, Int, Long, Long, Long)]] = {
    def fullBox(typ: String): Option[Long] =
      stbl.collectFirst { case (`typ`, cs, be) if be - cs >= 8 => cs }
    val sttsCs = fullBox("stts").getOrElse(return None)
    val stscCs = fullBox("stsc").getOrElse(return None)
    val stszCs = fullBox("stsz").getOrElse(return None)
    val (stcoCs, co64) = fullBox("stco").map((_, false))
      .orElse(fullBox("co64").map((_, true))).getOrElse(return None)
    def boxEnd(typ: String): Long =
      stbl.collectFirst { case (`typ`, _, be) => be }.get
    // stts runs
    val nStts = u32(sttsCs + 4)
    if (nStts < 0 || nStts > maxSamples ||
      sttsCs + 8 + nStts * 8 > boxEnd("stts")) return None
    val runs = (0L until nStts).map(k =>
      (u32(sttsCs + 8 + k * 8), u32(sttsCs + 12 + k * 8)))
    if (runs.exists(_._1 <= 0)) return None // zero-count run
    val total = runs.map(_._1).sum
    if (total <= 0 || total > maxSamples) return None
    // stsc chunk map: first_chunk strictly increasing from 1
    val nStsc = u32(stscCs + 4)
    if (nStsc <= 0 || nStsc > maxSamples ||
      stscCs + 8 + nStsc * 12 > boxEnd("stsc")) return None
    val chunkMap = (0L until nStsc).map(k =>
      (u32(stscCs + 8 + k * 12), u32(stscCs + 12 + k * 12)))
    if (chunkMap.head._1 != 1L ||
      chunkMap.exists(_._2 <= 0) ||
      chunkMap.sliding(2).exists(w => w.length == 2 &&
        w(1)._1 <= w(0)._1)) return None
    // stsz sizes
    val fixedSize = u32(stszCs + 4)
    val nStsz = u32(stszCs + 8)
    if (nStsz != total) return None
    if (fixedSize == 0 &&
      stszCs + 12 + nStsz * 4 > boxEnd("stsz")) return None
    def sizeOf(i: Int): Long =
      if (fixedSize != 0) fixedSize else u32(stszCs + 12 + i.toLong * 4)
    // chunk offsets
    val nChunksDeclared = u32(stcoCs + 4)
    val stcoW = if (co64) 8 else 4
    if (nChunksDeclared < 0 ||
      stcoCs + 8 + nChunksDeclared * stcoW >
        boxEnd(if (co64) "co64" else "stco")) return None
    def chunkOffset(c: Int): Long = {
      val at = stcoCs + 8 + c.toLong * stcoW
      if (co64) u64(at) else u32(at)
    }
    // the walk: one streaming pass, O(1) state
    val out = Vector.newBuilder[(Int, Int, Long, Long, Long)]
    var runIdx = 0; var leftInRun = runs.head._1; var pts = 0L
    var mapIdx = 0; var chunk = 1; var within = 0; var posInChunk = 0L
    var i = 0
    while (i < total) {
      // advance chunk when the current one is full per the active map
      if (within == chunkMap(mapIdx)._2.toInt) {
        chunk += 1; within = 0; posInChunk = 0L
        if (mapIdx + 1 < chunkMap.length &&
          chunkMap(mapIdx + 1)._1 == chunk.toLong) mapIdx += 1
      }
      if (chunk > nChunksDeclared) return None
      val sz = sizeOf(i)
      out += ((i, chunk, chunkOffset(chunk - 1) + posInChunk, sz, pts))
      posInChunk += sz; within += 1
      // advance pts per the stts run-length deltas
      pts += runs(runIdx)._2
      leftInRun -= 1
      if (leftInRun == 0 && runIdx + 1 < runs.length) {
        runIdx += 1; leftInRun = runs(runIdx)._1
      }
      i += 1
    }
    Some(out.result())
  }

  /** Partition-parallel REAL frame index — the sample-table upgrade of
    * [[frameSampleStub]]: one row per sample with its byte range and
    * pts, zero rows for malformed containers (a table-valued op's
    * malformed contract). The operator a video pipeline runs to plan
    * byte-range frame fetches before paying for any codec work. */
  def frameIndex(media: Dataset[MediaRecord], maxSamples: Int = 1000000)
      : Dataset[FrameIndexRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[FrameIndexRow] =
      Encoders.product[FrameIndexRow]
    media.flatMap { r =>
      parseMp4SampleTable(r.payload, maxSamples) match {
        case Some((ts, rows)) => rows.map { case (i, c, off, sz, pts) =>
          FrameIndexRow(r.doc_id, i, c, off, sz, pts, ts)
        }
        case None => Nil
      }
    }
  }

  /** Codec-free keyframe selection plan: bucket the [[frameIndex]] by
    * PRESENTATION SECOND (`pts div timescale`) and keep each bucket's
    * LARGEST sample (ties → earliest) — the standard no-decode
    * keyframe heuristic (I-frames dominate inter frames by size in
    * every GOP structure), yielding the byte ranges a thumbnail /
    * sampling pipeline fetches: one frame per second of video without
    * touching a codec. One row per (doc, second): `doc_id, bucket,
    * sample_idx, byte_offset, n_bytes, pts_units`. Malformed
    * containers contribute zero rows (the [[frameIndex]] contract).
    *
    * Scale: the per-(doc, second) window is bounded by the stream's
    * frame RATE (a few dozen rows), never its length. */
  def keyframePlan(media: Dataset[MediaRecord],
      maxSamples: Int = 1000000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "bucket")
      .orderBy(col("size").desc, col("sample_idx").asc)
    frameIndex(media, maxSamples).toDF()
      .withColumn("bucket", expr("pts_units div timescale"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("doc_id"), col("bucket"), col("sample_idx"),
        col("offset").as("byte_offset"), col("size").as("n_bytes"),
        col("pts_units"))
  }

  /** REAL raster resize for the uncompressed format ([[resampleBytes]]
    * remains the shape for codec-backed formats): nearest-neighbor
    * scaling of a 24-bit BMP, pure byte arithmetic — parse the
    * BITMAPINFOHEADER, sample source pixels at `(x·w/w2, y·h/h2)`,
    * re-emit a valid BMP with patched dimensions/sizes and 4-byte row
    * padding. Top-down bitmaps (negative height) stay top-down. None
    * for anything that is not a well-formed 24-bit BMP or for
    * non-positive targets. Never throws. */
  def resizeBmp(p: Array[Byte], outW: Int, outH: Int)
      : Option[Array[Byte]] = {
    if (outW <= 0 || outH <= 0) return None
    def u16le(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def i32le(i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dib = i32le(14)
    val w = i32le(18); val hRaw = i32le(22); val bits = u16le(28)
    if (dib < 40 || bits != 24 || w <= 0 || hRaw == 0 ||
      hRaw == Int.MinValue) return None
    val h = math.abs(hRaw)
    val off = i32le(10)
    def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4
    val srcRow = rowSize(w); val dstRow = rowSize(outW)
    if (off < 54 || off.toLong + srcRow.toLong * h > p.length) return None
    val outData = new Array[Byte](dstRow * outH)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        val s = off + sy * srcRow + sx * 3
        val d = y * dstRow + x * 3
        outData(d) = p(s); outData(d + 1) = p(s + 1)
        outData(d + 2) = p(s + 2)
        x += 1
      }
      y += 1
    }
    // canonical 54-byte header (BITMAPINFOHEADER), palette-free
    val out = new Array[Byte](54 + outData.length)
    def put16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + outData.length); put32(10, 54); put32(14, 40)
    put32(18, outW)
    put32(22, if (hRaw < 0) -outH else outH)
    put16(26, 1); put16(28, 24)
    put32(34, outData.length)
    System.arraycopy(outData, 0, out, 54, outData.length)
    Some(out)
  }

  /** REAL audio downsample for PCM/float WAV: keep every `factor`-th
    * sample frame (`blockAlign` bytes) — integer decimation, the
    * standard cheap resample when the target rate divides the source
    * rate. Re-emits a canonical 44-byte-header WAV with the reduced
    * rate and data size; chunk-skips like [[parseWavHeader]] to find
    * the source frames. None for malformed input, non-positive or
    * non-dividing factors. Never throws. */
  def decimateWav(p: Array[Byte], factor: Int): Option[Array[Byte]] = {
    if (factor <= 0) return None
    val hdr = parseWavHeader(p).getOrElse(return None)
    val (ch, rate, bits, _) = hdr
    if (rate % factor != 0) return None
    val ba = ch * bits / 8
    // locate the data chunk's byte offset (parseWavHeader validated
    // the structure; this re-scan only finds the position)
    def u32le(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
    var i = 12L
    var dataAt = -1L; var dataSize = 0L
    var fmtCode = 1
    while (dataAt < 0 && i + 8 <= p.length) {
      val at = i.toInt
      if (tag(at) == "data") { dataAt = at + 8; dataSize = u32le(at + 4) }
      else {
        if (tag(at) == "fmt ") // preserve PCM(1)/float(3) in the output
          fmtCode = (p(at + 8) & 0xff) | ((p(at + 9) & 0xff) << 8)
        i += 8 + u32le(at + 4) + (u32le(at + 4) % 2)
      }
    }
    if (dataAt < 0 || dataAt + dataSize > p.length) return None
    val nFrames = (dataSize / ba).toInt
    val outFrames = (nFrames + factor - 1) / factor
    val outData = new Array[Byte](outFrames * ba)
    var f = 0; var d = 0
    while (f < nFrames) {
      System.arraycopy(p, (dataAt + f.toLong * ba).toInt, outData,
        d * ba, ba)
      f += factor; d += 1
    }
    val out = new Array[Byte](44 + outData.length)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def puts(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) =>
        out(o + k) = b
      }
    val newRate = rate / factor
    puts(0, "RIFF"); put32(4, 36 + outData.length); puts(8, "WAVE")
    puts(12, "fmt "); put32(16, 16); put16(20, fmtCode); put16(22, ch)
    put32(24, newRate); put32(28, newRate * ba); put16(32, ba)
    put16(34, bits); puts(36, "data"); put32(40, outData.length)
    System.arraycopy(outData, 0, out, 44, outData.length)
    Some(out)
  }

  /** Signed 16-bit PCM samples of a mono WAV payload (first channel of
    * multi-channel input), with the sample rate — the decoded-domain
    * entry point [[spectralBandPower]] analyzes. None on anything
    * [[parseWavHeader]] rejects, non-16-bit PCM, or a truncated data
    * chunk. */
  def wavSamples16(p: Array[Byte]): Option[(Int, Array[Int])] = {
    val hdr = parseWavHeader(p).getOrElse(return None)
    val (ch, rate, bits, _) = hdr
    if (bits != 16) return None
    def u32le(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
    var i = 12L
    var dataAt = -1L; var dataSize = 0L
    while (dataAt < 0 && i + 8 <= p.length) {
      val at = i.toInt
      if (tag(at) == "data") { dataAt = at + 8; dataSize = u32le(at + 4) }
      else i += 8 + u32le(at + 4) + (u32le(at + 4) % 2)
    }
    if (dataAt < 0 || dataAt + dataSize > p.length) return None
    val ba = ch * 2
    val n = (dataSize / ba).toInt
    val out = new Array[Int](n)
    var f = 0
    while (f < n) {
      val o = (dataAt + f.toLong * ba).toInt
      out(f) = ((p(o) & 0xff) | (p(o + 1) << 8)).toShort.toInt
      f += 1
    }
    Some((rate, out))
  }

  /** Goertzel band power (Goertzel 1958 — the single-bin DFT every
    * tone/voicemail/DTMF detector runs; here: per-document spectral
    * energy at chosen frequencies, the cheap audio-content signal a
    * corpus pipeline gates on before paying for a full STFT pipeline).
    * Samples normalize by 2⁻¹⁵ (an EXACT binary scale — no rounding),
    * then for target frequency f: `coef = 2·cos(2π·f/rate)` and the
    * recursion `s = x + coef·s₁ − s₂` folds once over the samples;
    * `power = s₁² + s₂² − coef·s₁·s₂`. Every step is a fixed-order
    * IEEE-double expression and the coefficient is a literal computed
    * once — an engine replaying the same fold order reproduces the
    * power bit-for-bit (the byte-replay oracle class). */
  def goertzelPower(samples: Array[Int], rate: Int,
      freq: Double): Double = {
    val coef = 2.0 * math.cos(2.0 * math.Pi * freq / rate)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < samples.length) {
      val x = samples(i) / 32768.0
      val s = x + coef * s1 - s2
      s2 = s1; s1 = s
      i += 1
    }
    s1 * s1 + s2 * s2 - coef * s1 * s2
  }

  /** Per-document spectral band energies: decode 16-bit PCM
    * ([[wavSamples16]]) and evaluate [[goertzelPower]] at each target
    * frequency. One row per (doc, band): `doc_id, band, freq, power`
    * (round-6). Docs whose payload fails to decode are ABSENT (the
    * malformed→null family contract, surfaced by omission here since
    * the fan-out is per-band). Runs at the mapPartitions codec
    * boundary like every byte decoder; per-row cost is
    * O(samples·bands). */
  def spectralBands(media: Dataset[MediaRecord], freqs: Seq[Double])
      : DataFrame = {
    require(freqs.nonEmpty, "spectralBands: at least one frequency")
    val fs = freqs.toArray
    implicit val enc: org.apache.spark.sql.Encoder[
      (Long, Int, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaDouble, Encoders.scalaDouble)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        wavSamples16(r.payload).toSeq.flatMap { case (rate, samples) =>
          fs.zipWithIndex.map { case (f, b) =>
            (r.doc_id, b, f, goertzelPower(samples, rate, f))
          }
        }
      }
    }.toDF("doc_id", "band", "freq", "power")
      .select(col("doc_id"), col("band"), col("freq"),
        round(col("power"), 6).as("power"))
  }

  /** Canonical mono 16-bit PCM WAV writer — the audio fixture sibling
    * of [[encodeBmp24]]/[[encodePng]]: 44-byte canonical header +
    * little-endian samples, lossless, so a SQL oracle reconstructs
    * every sample from the generating function alone. */
  def encodeWavPcm16(rate: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0, s"encodeWavPcm16: bad rate $rate")
    val out = new Array[Byte](44 + samples.length * 2)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def puts(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) =>
        out(o + k) = b
      }
    puts(0, "RIFF"); put32(4, 36 + samples.length * 2); puts(8, "WAVE")
    puts(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, rate); put32(28, rate * 2); put16(32, 2); put16(34, 16)
    puts(36, "data"); put32(40, samples.length * 2)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i) & 0xffff); i += 1
    }
    out
  }

  /** 64-bit audio energy-envelope fingerprint — the audio dHash: the
    * first channel's |sample| stream reduces to 65 integer mean-energy
    * windows (same floor-division cell mapping as [[dHash64]]'s grid)
    * and bit k is set iff e(k) < e(k+1). Relative comparisons make an
    * EXACT volume scaling hash identically — re-normalized copies of
    * one recording land at hamming 0, unrelated audio sits near the
    * 32-bit random mean; feed [[graft.operators.Dedup.hammingCandidates]]
    * like any 64-bit signature. 16-bit PCM only (format 1); float,
    * malformed, and sub-65-sample payloads return None, never throw.
    * Pure integer arithmetic throughout — SQL-replayable. */
  def audioHash64(p: Array[Byte]): Option[Long] = {
    try {
      val (ch, _, bits, nDeclared) =
        parseWavHeader(p).getOrElse(return None)
      if (bits != 16) return None
      def u32le(i: Int): Long =
        (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
          ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
      def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
      // PCM check + data offset (parseWavHeader validated structure).
      // The walk visits EVERY chunk — a non-canonical file putting
      // 'fmt ' after 'data' must still fail the float check
      var i = 12L
      var dataAt = -1L
      var pcm = false
      while (i + 8 <= p.length) {
        val at = i.toInt
        if (tag(at) == "data" && dataAt < 0) dataAt = at + 8
        else if (tag(at) == "fmt ") {
          if (((p(at + 8) & 0xff) | ((p(at + 9) & 0xff) << 8)) != 1)
            return None // float PCM has no integer envelope
          pcm = true
        }
        i += 8 + u32le(at + 4) + (u32le(at + 4) % 2)
      }
      if (!pcm) return None
      val ba = ch * 2
      val n = math.min(nDeclared,
        if (dataAt < 0) 0L else (p.length - dataAt) / ba).toInt
      if (n < 65) return None
      val e = new Array[Long](65)
      val cnt = new Array[Long](65)
      var f = 0
      while (f < n) {
        val k = math.min(f.toLong * 65 / n, 64L).toInt
        val off = (dataAt + f.toLong * ba).toInt
        val s = ((p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)).toShort
        e(k) += math.abs(s.toInt); cnt(k) += 1L
        f += 1
      }
      var bitsOut = 0L
      var k = 0
      while (k < 64) {
        if (e(k) / cnt(k) < e(k + 1) / cnt(k + 1))
          bitsOut |= 1L << k
        k += 1
      }
      Some(bitsOut)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-payload [[audioHash64]] rows at the codec boundary. */
  def audioHashes(media: Dataset[MediaRecord]): Dataset[ImageDHash] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageDHash] =
      Encoders.product[ImageDHash]
    media.mapPartitions(rows =>
      rows.map(r => ImageDHash(r.doc_id, audioHash64(r.payload))))
  }

  /** Audio near-duplicate pairs — [[audioHashes]] through the same
    * band pigeonhole as [[nearDupImages]]. */
  def nearDupAudio(media: Dataset[MediaRecord], maxHamming: Int = 6,
      nBands: Int = 8, maxBucket: Int = 10000): DataFrame =
    Dedup.hammingCandidates(
      audioHashes(media).toDF().filter(col("dhash").isNotNull),
      "doc_id", "dhash", maxHamming, bits = 64, nBands = nBands,
      maxBucket = maxBucket)

  /** Size-envelope fingerprint over ANY per-item (seq, size) stream —
    * the VIDEO member of the perceptual-hash family: a codec-free
    * [[frameIndex]] already yields every sample's byte size, and the
    * size sequence IS a content signature (keyframe cadence, motion
    * bursts); re-muxed/re-chunked copies of one stream keep the
    * pattern while unrelated streams don't. Same construction as
    * [[dHash64]]/[[audioHash64]] — `nWindows` integer mean-size
    * windows (floor-division mapping), bit k set iff e(k) < e(k+1) —
    * but PURE RELATIONAL: two keyed aggregations + one self-join +
    * a `bit_or` fold, no bytes touched, so it runs on any (id, seq,
    * size) table at any scale and the oracle replays it 1:1. `seqCol`
    * must be the item's 0-based DENSE sample index ([[frameIndex]]'s
    * `sample_idx`) — the window mapping divides the index by the
    * count. Items with fewer than `nWindows` samples have
    * under-filled windows and are ABSENT from the output (hash them
    * with a smaller `nWindows`).
    * Output: (doc_id, dhash) — feed [[Dedup.hammingCandidates]]. */
  def sizeEnvelopeHash(frames: DataFrame, idCol: String, seqCol: String,
      sizeCol: String, nWindows: Int = 65): DataFrame = {
    require(nWindows >= 2 && nWindows <= 65,
      s"sizeEnvelopeHash: nWindows must be in [2, 65], got $nWindows")
    val counts = frames.groupBy(col(idCol).as("doc_id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= nWindows)
    val wins = frames
      .select(col(idCol).as("doc_id"), col(seqCol).cast("long").as("__i"),
        col(sizeCol).cast("long").as("__sz"))
      .join(counts, "doc_id")
      .select(col("doc_id"),
        least((col("__i") * nWindows -
            pmod(col("__i") * nWindows, col("__n"))) / col("__n"),
          lit(nWindows - 1L))
          .cast("long").as("k"), col("__sz"))
      .groupBy("doc_id", "k")
      .agg(sum("__sz").as("__s"), count(lit(1)).as("__c"))
      // exact integer mean: subtract the remainder BEFORE the (double)
      // division so the dividend divides exactly — bit-identical to
      // the oracle's integer `//`
      .select(col("doc_id"), col("k"),
        ((col("__s") - pmod(col("__s"), col("__c"))) / col("__c"))
          .cast("long").as("e"))
    val nxt = wins.select(col("doc_id"), (col("k") - 1).as("k"),
      col("e").as("e_next"))
    wins.join(nxt, Seq("doc_id", "k"))
      .filter(col("k") < nWindows - 1)
      .groupBy("doc_id")
      .agg(bit_or(when(col("e") < col("e_next"),
          expr("shiftleft(1L, cast(k as int))")).otherwise(lit(0L)))
        .as("dhash"))
  }

  /** Partition-parallel [[resizeBmp]]: (doc_id, payload) with the
    * resized bytes, null payload for malformed/unsupported input. */
  def resizeBmpImages(media: Dataset[MediaRecord], outW: Int,
      outH: Int): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.mapPartitions { rows =>
      rows.map(r => (r.doc_id, resizeBmp(r.payload, outW, outH).orNull))
    }.toDF("doc_id", "payload")
  }

  /** Partition-parallel [[decimateWav]]: (doc_id, payload) with the
    * downsampled bytes, null payload for malformed input. */
  def decimateWavAudio(media: Dataset[MediaRecord], factor: Int)
      : DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.mapPartitions { rows =>
      rows.map(r => (r.doc_id, decimateWav(r.payload, factor).orNull))
    }.toDF("doc_id", "payload")
  }

  /** REAL PNG encoder — minimal 8-bit RGB truecolor writer, pure JVM
    * (`java.util.zip.Deflater`/`CRC32` are the genuine zlib/CRC the PNG
    * spec mandates, RFC 2083 §4/§5): signature, IHDR (bit depth 8,
    * color type 2, no interlace), one zlib-compressed IDAT of
    * filter-0-prefixed scanlines, IEND. `rgb(x, y)` supplies each
    * pixel's channels (low 8 bits used). The sink-side half of the X4
    * image path: what it writes, [[decodeImage]] (or any standards
    * decoder) reads back bit-exactly — which is also what lets catalog
    * fixtures plant REAL compressed payloads whose decoded features an
    * oracle can replay in closed form. */
  def encodePng(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"encodePng: bad dims $width x $height")
    val raw = new Array[Byte](height * (1 + 3 * width))
    var y = 0
    while (y < height) {
      val base = y * (1 + 3 * width)
      raw(base) = 0 // filter type 0 (None) per scanline
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        raw(base + 1 + 3 * x) = r.toByte
        raw(base + 2 + 3 * x) = g.toByte
        raw(base + 3 + 3 * x) = b.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, false) // zlib-wrapped
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, content: Array[Byte]): Unit = {
      out.write(be32(content.length.toLong))
      val body = typ.getBytes("US-ASCII") ++ content
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      out.write(be32(crc.getValue))
    }
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** REAL pixel decode — `javax.imageio` (in the JDK: PNG, JPEG, GIF,
    * BMP readers), no external codec: full decompression to a pixel
    * raster, then (width, height, bands, per-channel means). The means
    * are exact integer-sum arithmetic over the sRGB-converted raster
    * (gray pixels report equal channels), so for losslessly-coded
    * constant or patterned images they are closed-form replayable.
    * None for anything ImageIO cannot decode — and for dimensions
    * above `maxPixels` (default 64 MPix), because a decoder that
    * trusts header dims is a decompression-bomb amplifier: a 40 kB
    * PNG can declare a 4 GPix raster. Never throws. */
  def decodeImagePixels(p: Array[Byte], maxPixels: Long = 1L << 26)
      : Option[(Int, Int, Int, Double, Double, Double)] = {
    try {
      // size-gate from the HEADER before ImageIO allocates the raster
      val dims = parseImageHeader(p).getOrElse(return None)
      if (dims._2.toLong * dims._3 > maxPixels) return None
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some((w, h, img.getColorModel.getNumComponents,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded image features: null columns ⇔ ImageIO could not decode
    * the payload (the malformed-payload contract). */
  case class ImagePixels(doc_id: Long, format: Option[String],
      width: Option[Int], height: Option[Int], bands: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double],
      mean_b: Option[Double])

  /** Partition-parallel REAL pixel decode over binary payloads — the
    * full-decompression upgrade of [[decodeImageHeaders]] (which stays
    * the cheap pre-gate: size-filter on headers BEFORE paying for
    * pixels). ImageIO's disk cache is disabled per partition — decode
    * must stay in-memory on executors. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImagePixels] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImagePixels] =
      Encoders.product[ImagePixels]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        decodeImagePixels(r.payload) match {
          case Some((w, h, bands, mr, mg, mb)) =>
            val fmt = parseImageHeader(r.payload).map(_._1)
            ImagePixels(r.doc_id, fmt, Some(w), Some(h), Some(bands),
              Some(mr), Some(mg), Some(mb))
          case None =>
            ImagePixels(r.doc_id, None, None, None, None, None, None, None)
        }
      }
    }
  }

  /** Minimal 24-bit uncompressed BMP writer (BITMAPINFOHEADER,
    * bottom-up scanlines padded to 4 bytes) — the LOSSLESS sibling of
    * [[encodePng]]: same `rgb(x, y)` convention (y = 0 is the top
    * row), but the pixel bytes land verbatim in the payload, so a SQL
    * oracle can reconstruct every decoded pixel from the generating
    * function alone (the q142 byte-replay pattern, applied to pixels). */
  def encodeBmp24(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeBmp24: bad dims $width x $height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val data = new Array[Byte](rowSize * height)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up storage
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        val base = fileRow * rowSize + 3 * x
        data(base) = b.toByte; data(base + 1) = g.toByte
        data(base + 2) = r.toByte
        x += 1
      }
      fileRow += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write('B'); out.write('M'); le32(54 + data.length)
    le32(0); le32(54); le32(40)
    le32(width); le32(height); le16(1); le16(24)
    le32(0); le32(data.length); le32(2835); le32(2835); le32(0); le32(0)
    out.write(data)
    out.toByteArray
  }

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint): decode, reduce to a 9×8 grayscale grid by exact
    * AREA AVERAGING over the raster (integer arithmetic — no Java2D
    * rendering pipeline, so the hash is deterministic across JVMs and
    * platforms), then bit y·8+x is set iff gray(x,y) < gray(x+1,y).
    * Comparisons are RELATIVE, so uniform brightness/contrast shifts
    * hash identically — which is exactly why dHash finds re-encoded /
    * re-exposed copies that byte-level dedup misses. Returns None for
    * undecodable payloads and for images smaller than the 9×8 grid
    * (nothing meaningful to compare). ITU gray = (299r+587g+114b)/1000,
    * all integer. */
  def dHash64(p: Array[Byte], maxPixels: Long = 1L << 26): Option[Long] = {
    try {
      val dims = parseImageHeader(p).getOrElse(return None)
      if (dims._2.toLong * dims._3 > maxPixels) return None
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w < 9 || h < 8) return None
      val g = Array.ofDim[Long](8, 9) // [row][col] gray sums
      val n = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val cy = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val cx = math.min(x * 9 / w, 8)
          val px = img.getRGB(x, y)
          g(cy)(cx) += (299L * ((px >> 16) & 0xff) +
            587L * ((px >> 8) & 0xff) + 114L * (px & 0xff)) / 1000L
          n(cy)(cx) += 1L
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val left = g(cy)(cx) / n(cy)(cx)
          val right = g(cy)(cx + 1) / n(cy)(cx + 1)
          if (left < right) bits |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      Some(bits)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-image dHash row; null ⇔ undecodable or sub-grid payload. */
  case class ImageDHash(doc_id: Long, dhash: Option[Long])

  /** Partition-parallel [[dHash64]] over binary payloads — same codec
    * boundary as [[decodeImages]]. */
  def dHashes(media: Dataset[MediaRecord]): Dataset[ImageDHash] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageDHash] =
      Encoders.product[ImageDHash]
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => ImageDHash(r.doc_id, dHash64(r.payload)))
    }
  }

  /** Image near-duplicate pairs: [[dHashes]] feeds the generic
    * [[Dedup.hammingCandidates]] band pigeonhole — the X4→X2 bridge
    * (re-encoded, re-compressed, brightness-shifted copies land within
    * a few bits; unrelated images sit near the 32-bit random-distance
    * mean). Undecodable payloads carry no hash and are always kept out
    * of pairing, matching the sub-shingle contract of the text path.
    * Returns (doc_a, doc_b, hamming), a < b. Default 8 bands of 8 bits
    * guarantee recall through hamming 7. */
  def nearDupImages(media: Dataset[MediaRecord], maxHamming: Int = 6,
      nBands: Int = 8, maxBucket: Int = 10000): DataFrame = {
    val sigs = dHashes(media).toDF()
      .filter(col("dhash").isNotNull)
    Dedup.hammingCandidates(sigs, "doc_id", "dhash",
      maxHamming, bits = 64, nBands = nBands, maxBucket = maxBucket)
  }

  /** SQL-expressible payload metadata (oracle-checkable subset): byte
    * length, content digest, kind tag. */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("digest"))
}

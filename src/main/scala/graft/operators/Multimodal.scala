package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.4 X4): media payloads travel as
  * opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs partition-parallel over the binary payloads.
  *
  * The actual image/audio codecs are NOT available in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake — but everything
  * around it (schema, encoders, partition-batched execution, feature
  * columns) is the real production shape: swap `fakeDecode` for a codec
  * call and nothing else changes.
  */
object Multimodal {

  /** Typed media row: payload + sidecar metadata, the X4 column model. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], kind: String)

  /** Decoded features produced by the (stubbed) decoder. */
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

  /** STUB — deterministic fake decode. A real implementation would hand
    * `payload` to an image/audio codec here; this fake derives "decoded"
    * properties purely from the bytes so tests are reproducible. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val mean = if (n == 0) 0.0
      else payload.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / n
    (width, height, mean)
  }

  /** Partition-parallel decode: one decoder instance per partition, rows
    * streamed through it in batches — the production shape for codec
    * feature extraction over binary columns. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaFeatures] =
      Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition setup would init the codec once here
      rows.map { r =>
        val (w, h, mean) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, w, h, mean)
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB — "resize" a payload to exactly `outBytes` bytes by nearest-
    * neighbor index mapping (the 1-D analog of image resampling). A real
    * implementation decodes, resamples pixels, re-encodes; the byte
    * arithmetic here keeps the schema/partitioning/batching identical. */
  def resizeStub(media: Dataset[MediaRecord], outBytes: Int)
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

  /** SQL-expressible payload metadata (oracle-checkable subset): byte
    * length, content digest, kind tag. */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("digest"))
}

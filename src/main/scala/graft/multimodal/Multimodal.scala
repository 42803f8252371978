package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, processed partition-wise.
  *
  * The byte-level container decode is REAL: [[parseImageHeader]] reads
  * PNG IHDR fields and walks JPEG segment markers to the SOF frame
  * header — magic bytes, big-endian fields, length-prefixed segment
  * skipping — with no codec dependency (header parse is pure byte
  * arithmetic, so it is deterministic and oracle-replayable). Full
  * PIXEL decode (inflate/DCT) needs codec libraries this environment
  * does not ship; the [[Decoder]] seam is where a deployment plugs a
  * JNI/codec call, and its default [[HeaderDecoder]] emits the parsed
  * header dimensions as features.
  */
object Multimodal {

  /** Parsed container metadata: format ("png"/"jpeg"), pixel
    * dimensions, and channel count — everything the header states
    * without decoding pixel data. */
  final case class ImageMeta(format: String, width: Int, height: Int,
      channels: Int)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private val PngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG color type → samples per pixel (PNG spec §11.2.2). */
  private val PngChannels =
    Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)

  /** Real byte-level header parse. PNG: verify the 8-byte magic and
    * read width/height/bit-depth/color-type from the IHDR chunk at its
    * fixed offset (the first chunk is IHDR by spec). JPEG: verify SOI,
    * then walk the length-prefixed segment stream — skipping fill
    * bytes, zero-payload markers and variable-length segments — to the
    * first SOF frame header (C0–CF minus DHT/JPG/DAC) and read
    * precision/height/width/components. Returns None for anything
    * unrecognized or truncated (a text payload, a cut-off upload) —
    * never throws on corpus garbage. */
  def parseImageHeader(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes.length >= 33 && PngMagic.indices.forall(i => bytes(i) == PngMagic(i)) &&
        new String(bytes, 12, 4, "US-ASCII") == "IHDR") {
      PngChannels.get(bytes(25) & 0xff).map(ch =>
        ImageMeta("png", be32(bytes, 16), be32(bytes, 20), ch))
    } else if (bytes.length >= 4 &&
        (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var pos = 2
      while (pos + 3 < bytes.length) {
        if ((bytes(pos) & 0xff) != 0xff) return None // desynced stream
        var m = bytes(pos + 1) & 0xff
        while (m == 0xff && pos + 2 < bytes.length) { pos += 1; m = bytes(pos + 1) & 0xff } // fill bytes
        pos += 2
        m match {
          case 0xd8 | 0x01 => () // SOI / TEM: no payload
          case r if r >= 0xd0 && r <= 0xd7 => () // RSTn: no payload
          case 0xd9 | 0xda => return None // EOI / SOS before any SOF
          case sof if sof >= 0xc0 && sof <= 0xcf &&
              sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            if (pos + 8 > bytes.length) return None
            return Some(ImageMeta("jpeg", be16(bytes, pos + 5),
              be16(bytes, pos + 3), bytes(pos + 7) & 0xff))
          case _ =>
            if (pos + 2 > bytes.length) return None
            val len = be16(bytes, pos)
            if (len < 2) return None
            pos += len
        }
      }
      None
    } else None
  }

  /** Encode a valid PNG header (magic + IHDR + zero CRC) in front of
    * `payload` — the byte-exact inverse of the PNG branch of
    * [[parseImageHeader]]. CRC is zeroed: header READERS don't verify
    * it, and keeping every byte a simple function of the arguments is
    * what lets an external oracle replay the blob arithmetic. */
  def pngBytes(width: Int, height: Int, colorType: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(PngChannels.contains(colorType), s"bad color type $colorType")
    val out = new java.io.ByteArrayOutputStream(33 + payload.length)
    out.write(PngMagic, 0, 8)
    def w32(v: Int): Unit =
      { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    w32(13)
    out.write("IHDR".getBytes("US-ASCII"), 0, 4)
    w32(width); w32(height)
    out.write(8) // bit depth
    out.write(colorType)
    out.write(0); out.write(0); out.write(0) // compression/filter/interlace
    w32(0) // CRC (unvalidated by header readers)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Encode a minimal JPEG header stream: SOI, a COM segment whose
    * length FIELD is `comLen` (≥ 2; segment lengths include the two
    * length bytes, so the comment body is comLen − 2 bytes — a
    * variable-size segment that exercises the walker's skip), SOF0
    * with the dimensions, then `payload`. Header size before the
    * payload is 14 + comLen + 3·channels bytes. Byte-exact inverse of
    * the JPEG branch of [[parseImageHeader]]. */
  def jpegBytes(width: Int, height: Int, channels: Int, comLen: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(comLen >= 2 && comLen <= 0xffff, s"bad COM length $comLen")
    // SOF dimensions are 16-bit fields — reject instead of silently
    // truncating (the parse would then byte-exactly invert a LIE)
    require(width >= 1 && width <= 0xffff, s"JPEG width $width outside [1, 65535]")
    require(height >= 1 && height <= 0xffff, s"JPEG height $height outside [1, 65535]")
    require(channels >= 1 && channels <= 255, s"bad channel count $channels")
    val out = new java.io.ByteArrayOutputStream(16 + comLen + payload.length)
    def w16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    w16(0xffd8) // SOI
    w16(0xfffe); w16(comLen) // COM
    (0 until comLen - 2).foreach(_ => out.write(0x20)) // comment filler
    w16(0xffc0); w16(8 + channels * 3) // SOF0; length = 8 + 3/component
    out.write(8) // precision
    w16(height); w16(width)
    out.write(channels)
    (0 until channels).foreach { c =>
      out.write(c + 1); out.write(0x11); out.write(0) // id, sampling, qtable
    }
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Pluggable decode stage — the seam where a deployment's codec
    * (JNI/ImageIO/ffmpeg) slots in without touching the Spark
    * plumbing. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Array[Double]
  }

  /** Default decoder: the REAL header parse as features
    * [width, height, channels]; payloads that are not a recognized
    * image container (plain text, truncated bytes) decode to byte
    * stats [length, 0, 0] — a deterministic, documented fallback, not
    * a parse failure. */
  object HeaderDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Array[Double] =
      parseImageHeader(bytes) match {
        case Some(m) => Array(m.width.toDouble, m.height.toDouble, m.channels.toDouble)
        case None => Array(bytes.length.toDouble, 0.0, 0.0)
      }
  }

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** Attach an opaque binary payload column + media-type metadata.
    * (Testdata has no real media files; text bytes stand in. At scale
    * the binary column comes straight from the lakehouse table.) */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"))

  /** Header metadata over a (doc_id, payload) frame: one partition-wise
    * pass through [[parseImageHeader]] → (doc_id, format, width,
    * height, channels), nulls for unrecognized payloads. */
  def imageMeta(spark: SparkSession, withPayload: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseImageHeader(bytes) match {
            case Some(m) => (id, Option(m.format), Option(m.width),
              Option(m.height), Option(m.channels))
            case None => (id, None: Option[String], None: Option[Int],
              None: Option[Int], None: Option[Int])
          }
        }
      }
      .toDF("doc_id", "format", "width", "height", "channels")
  }

  /** Partition-wise feature extraction over the binary column. One
    * pass, no shuffle; the iterator shape is what a vectorized decode
    * batch would use. */
  def extractFeatures(spark: SparkSession, withPayload: DataFrame,
      decoder: Decoder = HeaderDecoder): DataFrame = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val feats = decoder.decode(bytes)
          (id, bytes.length.toLong, md5hex(bytes), feats)
        }
      }
      .toDF("doc_id", "n_bytes", "content_hash", "features")
  }

  /** Frame-style sampling: split the payload into fixed-size chunks
    * and keep every `stride`-th — the video-frame-sampling access
    * pattern, minus the codec. */
  def sampleFrames(spark: SparkSession, withPayload: DataFrame,
      frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameSize).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) => (id, idx, frame.length, md5hex(frame)) }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_hash")
  }
}

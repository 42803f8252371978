package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.ImageMeta

/** The real byte-level container decode: PNG IHDR fields, JPEG
  * segment walking, robustness on garbage — plus encode→parse
  * round-trips over the header builders the gated queries use. */
class MultimodalSpec extends SparkSuite {
  init()
  import spark.implicits._

  // A REAL 1x1 RGBA PNG header (the canonical minimal PNG, genuine
  // CRC bytes 1F15C489) — pins the parser against actual in-the-wild
  // bytes, not just our own encoder.
  private val realPng: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // magic
    0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52, // len 13, "IHDR"
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // 1 x 1
    0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, // depth 8, RGBA, CRC
    0x89).map(_.toByte)

  test("parses a real-world PNG header (1x1 RGBA, genuine CRC)") {
    assert(Multimodal.parseImageHeader(realPng) ==
      Some(ImageMeta("png", 1, 1, 4)))
  }

  test("png encode -> parse round-trip across color types") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val b = Multimodal.pngBytes(640, 480, ct, Array[Byte](1, 2, 3))
      assert(Multimodal.parseImageHeader(b) ==
        Some(ImageMeta("png", 640, 480, ch)), s"color type $ct")
    }
    // big dimensions exercise all four big-endian bytes
    val big = Multimodal.pngBytes(70000, 300000, 2, Array.empty)
    assert(Multimodal.parseImageHeader(big) ==
      Some(ImageMeta("png", 70000, 300000, 3)))
  }

  test("jpeg encode -> parse: walker skips variable-length segments to SOF0") {
    for (comLen <- Seq(2, 3, 17, 300)) {
      val b = Multimodal.jpegBytes(1920, 1080, 3, comLen, Array[Byte](9))
      assert(Multimodal.parseImageHeader(b) ==
        Some(ImageMeta("jpeg", 1920, 1080, 3)), s"comLen $comLen")
    }
    assert(Multimodal.parseImageHeader(
      Multimodal.jpegBytes(65535, 65535, 1, 2, Array.empty)) ==
      Some(ImageMeta("jpeg", 65535, 65535, 1)))
  }

  test("jpeg walker: fill bytes before a marker, and SOF directly after SOI") {
    // FF-padding before the SOF marker (legal filler between segments)
    val padded = Array(0xff, 0xd8, 0xff, 0xff, 0xc0, 0x00, 0x0b, 0x08,
      0x00, 0x10, 0x00, 0x20, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(Multimodal.parseImageHeader(padded) ==
      Some(ImageMeta("jpeg", 32, 16, 1)))
    // no COM/APP segments at all: SOI then straight to SOF0
    val direct = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08,
      0x01, 0x00, 0x02, 0x00, 0x03, 0x01, 0x11, 0x00).map(_.toByte)
    assert(Multimodal.parseImageHeader(direct) ==
      Some(ImageMeta("jpeg", 512, 256, 3)))
    // progressive JPEG (SOF2) is a frame header too
    val sof2 = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b, 0x08,
      0x00, 0x08, 0x00, 0x09, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(Multimodal.parseImageHeader(sof2) ==
      Some(ImageMeta("jpeg", 9, 8, 1)))
    // DHT (C4) is NOT a frame header: it must be skipped by length,
    // and the SOF0 behind it still parses
    val dhtFirst = Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x05, 0x00, 0x06, 0x02,
      0x01, 0x11, 0x00, 0x02, 0x11, 0x00).map(_.toByte)
    assert(Multimodal.parseImageHeader(dhtFirst) ==
      Some(ImageMeta("jpeg", 6, 5, 2)))
  }

  test("garbage, text and truncated payloads parse to None, never throw") {
    assert(Multimodal.parseImageHeader("plain text payload".getBytes).isEmpty)
    assert(Multimodal.parseImageHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseImageHeader(realPng.take(20)).isEmpty) // cut IHDR
    // JPEG cut off mid-COM: walker runs out of bytes cleanly
    val cut = Multimodal.jpegBytes(10, 10, 1, 300, Array.empty).take(20)
    assert(Multimodal.parseImageHeader(cut).isEmpty)
    // SOS before any SOF is a structural error, not a crash
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(Multimodal.parseImageHeader(sosFirst).isEmpty)
  }

  test("fuzz: parseImageHeader never throws on arbitrary bytes (valid-prefix mutations included)") {
    // deterministic pseudo-random byte soup, plus mutations of VALID
    // headers (bit flips, truncations) — a byte parser's failure mode
    // is an uncaught index/era error on adversarial input, and this
    // corpus walks both magic branches into every guard
    val rnd = new scala.util.Random(0xC0FFEE)
    val valid = Seq(
      realPng,
      Multimodal.pngBytes(640, 480, 2, Array[Byte](1, 2, 3)),
      Multimodal.jpegBytes(1920, 1080, 3, 17, Array[Byte](9, 8)))
    val cases =
      (0 until 500).map(_ => Array.fill(rnd.nextInt(64))(rnd.nextInt.toByte)) ++
      // random payloads behind real magics (forces deep walking)
      (0 until 300).map { _ =>
        val magic = if (rnd.nextBoolean()) PngPrefix else JpegPrefix
        magic ++ Array.fill(rnd.nextInt(48))(rnd.nextInt.toByte)
      } ++
      // every truncation of each valid header
      valid.flatMap(v => (0 to v.length).map(v.take)) ++
      // single-bit flips of each valid header
      valid.flatMap(v => (0 until v.length).map { i =>
        val c = v.clone(); c(i) = (c(i) ^ (1 << (i % 8))).toByte; c
      })
    cases.foreach(b => Multimodal.parseImageHeader(b)) // must not throw
    assert(cases.nonEmpty)
  }

  private val PngPrefix =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val JpegPrefix = Array(0xff, 0xd8).map(_.toByte)

  test("imageMeta: media rows parse, non-media rows are null-typed") {
    val blobs = Seq(
      (1L, Multimodal.pngBytes(32, 8, 6, Array[Byte](5))),
      (2L, "not an image".getBytes),
      (3L, Multimodal.jpegBytes(100, 50, 3, 10, Array.empty)))
      .toDF("doc_id", "payload")
    val out = Multimodal.imageMeta(spark, blobs).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) == ((Some("png"), Some(32), Some(8), Some(4))))
    assert(out(2L) == ((None, None, None, None)))
    assert(out(3L) == ((Some("jpeg"), Some(100), Some(50), Some(3))))
  }
}

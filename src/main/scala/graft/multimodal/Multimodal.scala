package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, processed partition-wise.
  *
  * The actual media decode step is STUBBED — image/audio codecs are
  * not available in this environment — behind `Decoder`. Everything
  * around it is real and tested: the binary schema, the partition-wise
  * batch traversal, deterministic feature emission, and frame-style
  * chunk sampling. A production deployment swaps `Decoder.decode`
  * for a JNI/codec call without touching the Spark plumbing.
  */
object Multimodal {

  /** Pluggable decode stage. The default is a deterministic fake:
    * "features" derived from the raw bytes (md5 + length), standing in
    * for pixel/waveform features. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Array[Double]
  }

  object StubDecoder extends Decoder {
    // ??? in spirit: NOT a real media decode — deterministic stand-in.
    def decode(bytes: Array[Byte]): Array[Double] =
      Array(bytes.length.toDouble, bytes.count(_ % 2 == 0).toDouble)
  }

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** Attach an opaque binary payload column + media-type metadata.
    * (Testdata has no real media files; text bytes stand in. At scale
    * the binary column comes straight from the lakehouse table.) */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"))

  /** Partition-wise feature extraction over the binary column. One
    * pass, no shuffle; the iterator shape is what a vectorized decode
    * batch would use. */
  def extractFeatures(spark: SparkSession, withPayload: DataFrame,
      decoder: Decoder = StubDecoder): DataFrame = {
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

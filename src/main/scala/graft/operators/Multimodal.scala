package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video-as-bytes) column plumbing.
  *
  * The engine treats media as opaque `binary` columns plus a typed
  * metadata struct — the standard shape for a training-data lake (the
  * actual pixels/samples never leave the executors; metadata drives
  * filtering and batching decisions).
  *
  * This container has no imaging/audio libraries, so the DECODE KERNEL IS
  * A DETERMINISTIC STUB (clearly marked below): it "decodes" a media
  * payload by parsing its leading bytes. Everything around it — the binary
  * column, the metadata schema, the typed Dataset pass, partition-local
  * batching, the resize/frame-sample arithmetic — is real Spark plumbing
  * and is what you'd keep when swapping in a real codec.
  *
  * Two equivalent decode paths are provided:
  *   1. columnDecode*: pure Column expressions (codegen'd, oracle-able)
  *   2. datasetDecode: `mapPartitions` over the binary payload — the shape
  *      a real JNI/native decoder needs (per-partition init, batch loop).
  * A test asserts they agree byte-for-byte.
  */
object Multimodal {

  /** Attach a synthetic media payload to each document: 32 bytes derived
    * from the text (md5(text) || md5(text||'+')). Stands in for an image/
    * audio blob column; deterministic so oracles can replay it. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("media",
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("+"))))))

  // ---- STUB DECODE (deterministic fake; replace with real codec) --------
  // width  = 1 + (byte0 of payload & 63)    -- fake "parsed header"
  // height = 1 + (byte1 & 63)
  // format = ('png','jpg','webp')[byte2 % 3]
  // n_frames = 1 + (byte3 & 15)             -- fake video frame count

  /** Column-expression decode of byte `i` (0-based) of the payload's md5
    * hex — identical to reading byte i of the binary (payload IS the md5
    * bytes). Stays inside whole-stage codegen. */
  private def hexByte(text: org.apache.spark.sql.Column, i: Int) =
    conv(substring(md5(text), 2 * i + 1, 2), 16, 10).cast("long")

  /** STUB feature extraction: payload byte i as a feature value (a real
    * extractor would be pooled activations or a color histogram; the
    * pipeline shape — per-media fixed-width numeric features feeding the
    * s6x similarity ops — is what's real here). */
  def columnFeature(text: org.apache.spark.sql.Column, i: Int) = hexByte(text, i)

  def columnWidth(text: org.apache.spark.sql.Column)  = hexByte(text, 0) % 64 + 1
  def columnHeight(text: org.apache.spark.sql.Column) = hexByte(text, 1) % 64 + 1
  def columnFormat(text: org.apache.spark.sql.Column) =
    element_at(array(lit("png"), lit("jpg"), lit("webp")), (hexByte(text, 2) % 3 + 1).cast("int"))
  def columnFrames(text: org.apache.spark.sql.Column) = hexByte(text, 3) % 16 + 1

  /** Decoded metadata record. */
  case class MediaMeta(doc_id: Long, width: Long, height: Long,
                       format: String, n_frames: Long)

  /** Per-payload decode result (codec output, before the doc id is
    * re-attached). */
  case class DecodedMeta(width: Long, height: Long, format: String,
                         n_frames: Long)

  /** The codec seam: a real decoder (JNI/FFI image/audio/video library)
    * plugs in here without touching the Spark plumbing. Contract:
    *   - the INSTANCE is constructed on the driver and shipped to
    *     executors in the task closure, so it must be Serializable and
    *     must NOT hold native handles as fields;
    *   - `open()` is called once per partition ON THE EXECUTOR — acquire
    *     native contexts/scratch buffers there and capture them in the
    *     returned function's closure;
    *   - the returned function is called once per payload; `None` is the
    *     undecodable channel (null / truncated bytes — production routes
    *     these to a quarantine sink rather than failing the task). */
  trait MediaCodec extends Serializable {
    def open(): Array[Byte] => Option[DecodedMeta]
  }

  /** CI-default codec: the deterministic header-parse stub (this
    * container has no media libraries). Parses the actual binary payload
    * bytes — same formula the column path computes via md5 hex. */
  object StubCodec extends MediaCodec {
    def open(): Array[Byte] => Option[DecodedMeta] = {
      val formats = Array("png", "jpg", "webp") // per-partition "codec table"
      bytes =>
        if (bytes != null && bytes.length >= 4) {
          val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
          val b2 = bytes(2) & 0xff; val b3 = bytes(3) & 0xff
          Some(DecodedMeta(b0 % 64 + 1, b1 % 64 + 1, formats(b2 % 3), b3 % 16 + 1))
        } else None
    }
  }

  /** The `mapPartitions` decode path: per-partition codec `open()` then a
    * streaming batch loop — the real-world shape for native decoders.
    * The column path ([[columnWidth]] etc.) instead yields null metadata
    * for undecodable payloads; the equivalence contract (MultimodalSpec)
    * covers decodable payloads. */
  def datasetDecode(spark: SparkSession, withMedia: DataFrame,
                    codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codec.open() // once per partition, executor-side
        it.flatMap { case (id, bytes) =>
          decode(bytes).map(m =>
            MediaMeta(id, m.width, m.height, m.format, m.n_frames))
        }
      }
  }

  /** Aspect-preserving integer resize into a `target` box: scale the
    * longer edge to `target`, the other proportionally, floor to >=1.
    * Pure integer div (`a div b`) so any engine agrees exactly.
    * Takes/returns SQL expression strings over columns `width`/`height`. */
  def resizeExprs(target: Int): (String, String) = (
    s"greatest(1L, (width * $target) div greatest(width, height))",
    s"greatest(1L, (height * $target) div greatest(width, height))")
}

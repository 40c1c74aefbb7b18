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

  /** The `mapPartitions` decode path: per-partition "codec init" then a
    * streaming batch loop — the real-world shape for native decoders.
    * Parses the actual binary payload bytes (not the hex trick). */
  def datasetDecode(spark: SparkSession, withMedia: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    val formats = Array("png", "jpg", "webp") // per-partition constant ("codec table")
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoder would initialize native context here, once per partition.
        // Undecodable payloads (null / truncated header) are SKIPPED, the
        // standard decoder error channel (production would route them to a
        // quarantine sink) — the Column path instead yields null metadata
        // for them; the equivalence contract covers decodable payloads.
        it.flatMap {
          case (id, bytes) if bytes != null && bytes.length >= 4 =>
            val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
            val b2 = bytes(2) & 0xff; val b3 = bytes(3) & 0xff
            Some(MediaMeta(id, b0 % 64 + 1, b1 % 64 + 1, formats(b2 % 3), b3 % 16 + 1))
          case _ => None
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

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
  * Two codecs plug into the [[MediaCodec]] seam: [[StubCodec]], a
  * deterministic header-parse fake over the synthetic md5 payloads (what
  * the DuckDB oracle replays), and [[ImageIoCodec]], a real JDK
  * `javax.imageio` decoder for genuine PNG/JPEG/GIF/BMP bytes. Everything
  * around the seam — the binary column, the metadata schema, the typed
  * Dataset pass, partition-local codec init, the resize/frame-sample
  * arithmetic — is shared Spark plumbing; audio/video codecs (not in the
  * JDK) would plug into the same seam.
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

  /** Oracle-default codec: deterministic header-parse stub over the
    * synthetic md5 payloads (which are not real images). Parses the actual
    * binary payload bytes — same formula the column path computes via md5
    * hex — so the DuckDB oracle can replay it. */
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

  /** Real image codec over the same seam: `javax.imageio` ships with every
    * JDK, so this needs no container libraries. Decodes genuine PNG/JPEG/
    * GIF/BMP payloads to true width/height/format and (for multi-image
    * containers like animated GIF) the real frame count. Undecodable bytes
    * — truncated headers, non-image payloads such as the synthetic md5
    * blobs the oracle queries use — take the `None` quarantine channel,
    * exactly like the stub.
    *
    * Header-only metadata read: `ImageReader.getWidth/getHeight` parse the
    * header without decoding pixel data, so per-payload cost is O(header),
    * not O(pixels) — the right trade for a 100 TB metadata pass. */
  object ImageIoCodec extends MediaCodec {
    def open(): Array[Byte] => Option[DecodedMeta] = {
      bytes =>
        if (bytes == null || bytes.length == 0) None
        else {
          // MemoryCacheImageInputStream directly: decode stays pure
          // in-memory (no executor-local temp-file churn under 32 tasks)
          // WITHOUT ImageIO.setUseCache(false) — that static toggle is
          // JVM-global and would silently change behavior for any other
          // ImageIO user sharing the executor.
          val in = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(in)
            if (!readers.hasNext) None
            else {
              val r = readers.next()
              try {
                // seekForwardOnly=false so getNumImages(true) may scan.
                r.setInput(in, false, true)
                val w = r.getWidth(0).toLong
                val h = r.getHeight(0).toLong
                val fmt = r.getFormatName.toLowerCase match {
                  case "jpeg" => "jpg"
                  case f      => f
                }
                // getNumImages(true) walks the WHOLE stream (the JPEG
                // reader scans every byte for extra SOI markers) — that
                // would make this an O(payload) pass, not O(header).
                // Only multi-image containers pay it; single-image
                // formats are frames=1 by definition.
                val frames =
                  if (fmt != "gif") 1L
                  else try math.max(1, r.getNumImages(true)).toLong
                       catch { case _: java.io.IOException => 1L }
                Some(DecodedMeta(w, h, fmt, frames))
              } finally r.dispose()
            }
          } catch {
            // Corrupt-after-header payloads: quarantine, never fail the task.
            case scala.util.control.NonFatal(_) => None
          } finally if (in != null) in.close()
        }
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

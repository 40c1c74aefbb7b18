package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "pack my box with five dozen jugs")
  ).toDF("doc_id", "text")

  test("payload is 32 deterministic bytes derived from the text") {
    val media = Multimodal.withPayload(docs).select("media").as[Array[Byte]].collect()
    assert(media.forall(_.length === 32))
    val again = Multimodal.withPayload(docs).select("media").as[Array[Byte]].collect()
    assert(media.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("column decode and mapPartitions decode agree exactly") {
    val viaColumns = docs.select(
      $"doc_id",
      Multimodal.columnWidth($"text").as("width"),
      Multimodal.columnHeight($"text").as("height"),
      Multimodal.columnFormat($"text").as("format"),
      Multimodal.columnFrames($"text").as("n_frames"))
      .orderBy("doc_id")
      .as[Multimodal.MediaMeta].collect().toSeq

    val viaDataset = Multimodal.datasetDecode(spark, Multimodal.withPayload(docs))
      .orderBy("doc_id").collect().toSeq

    assert(viaColumns === viaDataset)
  }

  test("decoded metadata is in the stub's declared ranges") {
    val meta = Multimodal.datasetDecode(spark, Multimodal.withPayload(docs)).collect()
    assert(meta.forall(m => m.width >= 1 && m.width <= 64))
    assert(meta.forall(m => m.height >= 1 && m.height <= 64))
    assert(meta.forall(m => Set("png", "jpg", "webp")(m.format)))
    assert(meta.forall(m => m.n_frames >= 1 && m.n_frames <= 16))
  }

  test("codec seam: an injected decoder replaces the stub without plumbing changes") {
    // A fake "real" codec: counts per-partition open() calls (the native-
    // init contract) and decodes to values the stub can't produce, so the
    // output provably came through the injected codec. Undecodable (short)
    // payloads take the None quarantine channel.
    val opens = spark.sparkContext.longAccumulator("codec-opens")
    val fake = new Multimodal.MediaCodec {
      def open(): Array[Byte] => Option[Multimodal.DecodedMeta] = {
        opens.add(1) // executor-side, once per partition
        bytes =>
          if (bytes != null && bytes.length >= 4)
            Some(Multimodal.DecodedMeta(1000 + (bytes(0) & 0xff), 2000, "tiff", 99))
          else None
      }
    }
    val withMedia = Multimodal.withPayload(docs)
      .union(Seq((4L, "x")).toDF("doc_id", "text")
        .withColumn("media", lit(Array[Byte](1, 2)))) // truncated header
      .repartition(2)
    val out = Multimodal.datasetDecode(spark, withMedia, fake).collect()
    assert(out.length === 3, "undecodable payload must be quarantined, not emitted")
    assert(out.forall(m => m.width >= 1000 && m.format == "tiff" && m.n_frames == 99))
    // >= rather than ===: accumulator updates inside a transformation are
    // re-counted under task retry/speculation, so the lower bound is the
    // only retry-safe claim (2 partitions => at least 2 opens).
    assert(opens.value >= 2, s"open() must run once per partition, ran ${opens.value}")
  }

  // ---- real-codec coverage: javax.imageio over genuine image bytes ------

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff3366) // non-uniform so the encoder has real content
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def gifBytes(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, i * 40 + 10)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  test("ImageIoCodec decodes real PNG payloads to their true dimensions") {
    val sizes = Seq((1L, 7, 3), (2L, 64, 64), (3L, 1, 1), (4L, 120, 45))
    val withMedia = sizes.map { case (id, w, h) => (id, pngBytes(w, h)) }
      .toDF("doc_id", "media").repartition(2)
    val out = Multimodal.datasetDecode(spark, withMedia, Multimodal.ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.size === sizes.size)
    sizes.foreach { case (id, w, h) =>
      val m = out(id)
      assert(m.width === w.toLong, s"doc $id width")
      assert(m.height === h.toLong, s"doc $id height")
      assert(m.format === "png")
      assert(m.n_frames === 1L)
    }
  }

  test("ImageIoCodec reads the real frame count of an animated GIF") {
    val withMedia = Seq((1L, gifBytes(9, 5, 4)), (2L, gifBytes(3, 3, 1)))
      .toDF("doc_id", "media")
    val out = Multimodal.datasetDecode(spark, withMedia, Multimodal.ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).format === "gif" && out(1L).n_frames === 4L)
    assert(out(1L).width === 9L && out(1L).height === 5L)
    assert(out(2L).n_frames === 1L)
  }

  test("ImageIoCodec quarantines non-image and truncated payloads") {
    val png = pngBytes(10, 10)
    val withMedia = Seq(
      (1L, png),                                   // decodable
      (2L, Multimodal.withPayload(docs).limit(1)   // synthetic md5 blob
        .select("media").as[Array[Byte]].head()),
      (3L, png.take(8)),                           // PNG magic, truncated header
      (4L, Array.empty[Byte]),
      (5L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "media")
    val out = Multimodal.datasetDecode(spark, withMedia, Multimodal.ImageIoCodec).collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L),
      "only the genuine PNG may decode; everything else is quarantined")
  }

  test("stub and real codec run through the identical plumbing (same plan shape)") {
    // The seam contract: swapping codecs must not change the Spark plan.
    // Compare the FULL node-class sequence, not just the top node — every
    // datasetDecode plan tops out at SerializeFromObject, so a top-only
    // compare would pass even if one codec path grew an extra shuffle.
    def shape(codec: Multimodal.MediaCodec): Seq[String] =
      Multimodal.datasetDecode(spark, Multimodal.withPayload(docs), codec)
        .queryExecution.optimizedPlan
        .collect { case n => n.getClass.getName }
    assert(shape(Multimodal.StubCodec) === shape(Multimodal.ImageIoCodec))
  }

  test("resize preserves aspect ratio direction and caps the long edge") {
    val (rw, rh) = Multimodal.resizeExprs(32)
    val out = Seq((64L, 16L), (10L, 40L), (1L, 1L)).toDF("width", "height")
      .selectExpr(s"$rw as w", s"$rh as h").as[(Long, Long)].collect().toSeq
    assert(out === Seq((32L, 8L), (8L, 32L), (32L, 32L)))
  }
}

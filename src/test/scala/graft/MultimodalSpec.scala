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
    assert(opens.value === 2, s"open() must run once per partition, ran ${opens.value}")
  }

  test("resize preserves aspect ratio direction and caps the long edge") {
    val (rw, rh) = Multimodal.resizeExprs(32)
    val out = Seq((64L, 16L), (10L, 40L), (1L, 1L)).toDF("width", "height")
      .selectExpr(s"$rw as w", s"$rh as h").as[(Long, Long)].collect().toSeq
    assert(out === Seq((32L, 8L), (8L, 32L), (32L, 32L)))
  }
}

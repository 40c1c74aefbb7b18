package graft

import org.apache.spark.sql.functions._

import graft.Tables.documents
import graft.functions.Similarity.duckHexToLong
import graft.operators.Multimodal._

/** Multimodal-column suite: binary media payloads with typed metadata.
  * The decode kernel is a deterministic stub (no codec libs in this
  * container — see operators.Multimodal); the plumbing, schema, and
  * arithmetic are real and oracle-checked. DuckDB replays the stub via
  * md5-hex byte arithmetic (the payload bytes ARE the md5 bytes).
  */
object MultimodalQueries {

  // DuckDB twins of Multimodal.columnWidth/Height/Format/Frames
  private def duckByte(i: Int) = duckHexToLong(s"substr(md5(text), ${2 * i + 1}, 2)", 2)
  private val duckWidth  = s"${duckByte(0)} % 64 + 1"
  private val duckHeight = s"${duckByte(1)} % 64 + 1"
  private val duckFormat = s"(['png', 'jpg', 'webp'])[${duckByte(2)} % 3 + 1]"
  private val duckFrames = s"${duckByte(3)} % 16 + 1"

  def defs: Seq[QueryDef] = Seq(

    // ---- m70: decode media headers -> typed metadata ---------------------
    QueryDef("m70_media_decode",
      (s, dir) => documents(s, dir)
        .select(col("doc_id"),
                columnWidth(col("text")).as("width"),
                columnHeight(col("text")).as("height"),
                columnFormat(col("text")).as("format"),
                columnFrames(col("text")).as("n_frames"))
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id,
               CAST($duckWidth AS BIGINT) AS width,
               CAST($duckHeight AS BIGINT) AS height,
               $duckFormat AS format,
               CAST($duckFrames AS BIGINT) AS n_frames
        FROM documents ORDER BY doc_id""")),

    // ---- m71: aspect-preserving integer resize into a 32px box ----------
    QueryDef("m71_media_resize",
      (s, dir) => {
        val (rw, rh) = resizeExprs(32)
        documents(s, dir)
          .select(col("doc_id"),
                  columnWidth(col("text")).as("width"),
                  columnHeight(col("text")).as("height"))
          .withColumn("resized_w", expr(rw))
          .withColumn("resized_h", expr(rh))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id, width, height,
               GREATEST(1, (width * 32) // GREATEST(width, height)) AS resized_w,
               GREATEST(1, (height * 32) // GREATEST(width, height)) AS resized_h
        FROM (SELECT doc_id,
                     CAST($duckWidth AS BIGINT) AS width,
                     CAST($duckHeight AS BIGINT) AS height
              FROM documents)
        ORDER BY doc_id""")),

    // ---- m72: frame sampling (video stub): every 4th frame, exploded ----
    QueryDef("m72_frame_sample",
      (s, dir) => documents(s, dir)
        .select(col("doc_id"), columnFrames(col("text")).as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
                explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx"))
        .orderBy("doc_id", "frame_idx"),
      Some(s"""
        SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx
        FROM (SELECT doc_id, CAST($duckFrames AS BIGINT) AS n_frames FROM documents)
        ORDER BY doc_id, frame_idx""")),

    // ---- m73: media stats by format (metadata-driven planning) ----------
    QueryDef("m73_media_stats",
      (s, dir) => documents(s, dir)
        .select(columnFormat(col("text")).as("format"),
                (columnWidth(col("text")) * columnHeight(col("text"))).as("px"))
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
             sum(col("px")).as("total_px"),
             (sum(col("px")).cast("double") / count(lit(1))).as("mean_px"))
        .orderBy("format"),
      Some(s"""
        SELECT format, COUNT(*) AS n,
               CAST(SUM(px) AS BIGINT) AS total_px,
               CAST(SUM(px) AS DOUBLE) / COUNT(*) AS mean_px
        FROM (SELECT $duckFormat AS format,
                     CAST(($duckWidth) * ($duckHeight) AS BIGINT) AS px
              FROM documents)
        GROUP BY format ORDER BY format""")),

    // ---- m74: feature extraction (stub kernel, real vector plumbing) ----
    // Per-media fixed-width numeric features (bytes 4..11 of the payload
    // standing in for pooled activations / histogram bins) plus their
    // exact integer norm — the decode -> FEATURES -> similarity pipeline
    // stage. (Packed into an array column these become the numeric input
    // the s6x ANN operators consume; emitted flat here so the oracle
    // compare stays scalar.) Map-side only, zero shuffle.
    QueryDef("m74_media_features",
      (s, dir) => {
        val feats = (4 until 12).map(i => columnFeature(col("text"), i))
        documents(s, dir)
          .select(Seq(col("doc_id")) ++
            feats.zipWithIndex.map { case (f, i) => f.as(s"f$i") } :+
            feats.map(f => f * f).reduce(_ + _).as("f_norm"): _*)
          .orderBy("doc_id")
      },
      Some {
        val fs = (4 until 12).map(i => s"CAST(${duckByte(i)} AS BIGINT)")
        val cols = fs.zipWithIndex.map { case (f, i) => s"$f AS f$i" }.mkString(",\n               ")
        val norm = fs.map(f => s"($f) * ($f)").mkString(" + ")
        s"""
        SELECT doc_id,
               $cols,
               CAST($norm AS BIGINT) AS f_norm
        FROM documents ORDER BY doc_id"""
      }))

}

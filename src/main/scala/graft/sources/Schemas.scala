package graft.sources

import org.apache.spark.sql.types._

/** Explicit schemas for the logical tables of the reference pipeline
  * (reynaldyAl/BigData06). The reference never declares schemas — they
  * exist implicitly as dict keys per extractor (artist: 6 cols,
  * 01_TestingPy/Spotify_API.py:78-85; playlist track: 15 cols,
  * Spotify_API4.py:373-388) and pandas infers dtypes. Here both layers are
  * explicit:
  *
  *   - **bronze**: the nested payload as the API returns it
  *     (`followers:{total}`, `genres:array`, `images:array<struct>`), kept
  *     losslessly at ingest;
  *   - **silver**: the flat analytic tables the reference materializes,
  *     produced from bronze by the projections in [[Flatten]].
  *
  * Declared schemas matter at scale: schema-on-read inference is a full
  * extra pass over 100 TB, and silent dtype drift (pandas' failure mode,
  * which the reference inherits via CSV round-trips) becomes a
  * correctness bug. `followers` is LongType because real-world artist
  * follower counts exceed 2^31 (SURVEY.md §1.2).
  */
object Schemas {

  // ---- bronze (nested, as fetched) ---------------------------------------

  val image: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("height", IntegerType),
    StructField("width", IntegerType)))

  /** Artist payload — Spotify_API.py:78-85. */
  val artistBronze: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("popularity", IntegerType),
    StructField("followers", StructType(Seq(StructField("total", LongType)))),
    StructField("genres", ArrayType(StringType)),
    StructField("images", ArrayType(image))))

  val artistRef: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType)))

  /** Track payload (top-tracks / album-tracks shape) — Spotify_API.py:100-108,
    * Spotify_API3.py:141-151. */
  val trackBronze: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("popularity", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("explicit", BooleanType),
    StructField("track_number", IntegerType),
    StructField("disc_number", IntegerType),
    StructField("artists", ArrayType(artistRef)),
    StructField("album", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("release_date", StringType))))))

  /** Album payload — Spotify_API.py:143-153. */
  val albumBronze: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("artists", ArrayType(artistRef)),
    StructField("release_date", StringType),
    StructField("total_tracks", IntegerType),
    StructField("album_type", StringType),
    StructField("images", ArrayType(image))))

  /** Playlist payload — Spotify_API4.py:259-271. */
  val playlistBronze: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("owner", StructType(Seq(
      StructField("id", StringType),
      StructField("display_name", StringType)))),
    StructField("followers", StructType(Seq(StructField("total", LongType)))),
    StructField("tracks", StructType(Seq(StructField("total", IntegerType)))),
    StructField("images", ArrayType(image)),
    StructField("external_urls", StructType(Seq(StructField("spotify", StringType)))),
    StructField("public", BooleanType),
    StructField("collaborative", BooleanType)))

  /** Playlist-track item: `{track:{...}, added_at}` envelope with
    * local-track nulls — Spotify_API4.py:361-388. */
  val playlistItemBronze: StructType = StructType(Seq(
    StructField("added_at", StringType),
    StructField("track", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("popularity", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("explicit", BooleanType),
      StructField("preview_url", StringType),
      StructField("artists", ArrayType(artistRef)),
      StructField("album", StructType(Seq(StructField("name", StringType)))),
      StructField("external_urls", StructType(Seq(
        StructField("spotify", StringType)))))))))

  /** Category payload — Spotify_API3.py:296-304. */
  val categoryBronze: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("icons", ArrayType(image))))
}

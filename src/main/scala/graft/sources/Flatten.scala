package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze→silver flattening projections — the reference's per-extractor
  * dict-building loops (SURVEY.md §2.2, P1–P8) re-expressed as single
  * `select`s over nested columns. Each row-at-a-time Python loop becomes
  * one declarative projection Catalyst can prune and push down; nothing
  * here shuffles.
  *
  * Null policy: the reference defaults missing values (`''`/`0`/`False` —
  * e.g. `artist['images'][0]['url'] if artist['images'] else ''`,
  * 01_TestingPy/Spotify_API.py:84). The same defaults are applied with
  * `coalesce`, so silver columns are non-null exactly where the reference's
  * were.
  */
object Flatten {

  /** P3: head of an array-of-structs' field, or default (Spotify_API.py:84).
    * try_element_at: under ANSI semantics (Spark 4 default) a plain
    * element_at throws on an empty array instead of yielding null. */
  def headOr(arrField: Column, default: String): Column =
    coalesce(try_element_at(arrField, lit(1)), lit(default))

  /** P2: array-of-struct names → ", "-joined string (Spotify_API.py:83,144). */
  def joinedNames(artists: Column): Column =
    coalesce(array_join(transform(artists, a => a.getField("name")), ", "), lit(""))

  /** P7: first artist name or 'Unknown' (Spotify_API3.py:150). */
  def firstArtistOr(artists: Column, default: String = "Unknown"): Column =
    when(size(artists) > 0, artists.getItem(0).getField("name")).otherwise(lit(default))

  /** P5: duration_ms → minutes rounded to 2 places (Spotify_API4.py:379). */
  def durationMin(durationMs: Column): Column =
    round(durationMs.cast("double") / 60000.0, 2)

  /** Tolerant release-date parse: Spotify returns `yyyy`, `yyyy-MM`, or
    * `yyyy-MM-dd` (variable precision, Spotify_API.py:105). Semantic:
    * first day of the period. The raw string is kept alongside —
    * SURVEY.md §7.4 flags this as a correctness trap. */
  def releaseDateParsed(releaseDate: Column): Column =
    coalesce(
      try_to_date(releaseDate, "yyyy-MM-dd"),
      try_to_date(concat(releaseDate, lit("-01")), "yyyy-MM-dd"),
      try_to_date(concat(releaseDate, lit("-01-01")), "yyyy-MM-dd"))

  /** Artists: 6-column silver table (P1+P2+P3; Spotify_API.py:78-85). */
  def artists(bronze: DataFrame): DataFrame =
    bronze.select(
      col("id"),
      col("name"),
      coalesce(col("popularity"), lit(0)).as("popularity"),
      coalesce(col("followers.total"), lit(0L)).as("followers"),
      coalesce(array_join(col("genres"), ", "), lit("")).as("genres"),
      col("genres").as("genres_arr"), // kept: silver may retain the array form
      headOr(col("images.url"), "").as("image_url"))

  /** Tracks (top-tracks shape, v3: + artist context columns carried from the
    * fan-out parent; Spotify_API3.py:141-151). `passthrough` keeps extra
    * fan-out context columns (e.g. `album_id`) across the projection. */
  def tracks(bronze: DataFrame, artistId: Column = lit(""),
             artistName: Column = lit(""),
             passthrough: Seq[Column] = Nil): DataFrame =
    bronze.select(Seq(
      col("id"),
      col("name"),
      coalesce(col("popularity"), lit(0)).as("popularity"),
      col("album.name").as("album_name"),
      col("album.release_date").as("release_date"),
      releaseDateParsed(col("album.release_date")).as("release_dt"),
      coalesce(col("duration_ms"), lit(0)).as("duration_ms"),
      coalesce(col("explicit"), lit(false)).as("explicit"),
      artistId.as("artist_id"),
      // Fallback chain: payload's first artist, else the fan-out parent
      // context (when provided), else 'Unknown'. firstArtistOr can't sit
      // first here — it never returns null, so the caller's context would
      // be unreachable for empty artist arrays.
      coalesce(
        when(size(col("artists")) > 0, col("artists").getItem(0).getField("name")),
        nullif(artistName, lit("")),
        lit("Unknown")).as("artist_name"))
      ++ passthrough: _*)

  /** Albums / new releases (P1+P2+P3; Spotify_API.py:143-153). v4 appends
    * `source_country` per fan-out branch (P6; Spotify_API4.py:518). */
  def albums(bronze: DataFrame, sourceCountry: Option[String] = None): DataFrame = {
    val base = bronze.select(
      col("id"),
      col("name"),
      joinedNames(col("artists")).as("artists"),
      col("release_date"),
      releaseDateParsed(col("release_date")).as("release_dt"),
      coalesce(col("total_tracks"), lit(0)).as("total_tracks"),
      coalesce(col("album_type"), lit("")).as("album_type"),
      headOr(col("images.url"), "").as("image_url"))
    sourceCountry.fold(base)(c => base.withColumn("source_country", lit(c)))
  }

  /** Playlists: 11-column silver table (P1+P3+P4; Spotify_API4.py:259-271).
    * `public` stays nullable — the API returns null there and the
    * reference keeps it (`:269`). */
  def playlists(bronze: DataFrame): DataFrame =
    bronze.select(
      col("id"),
      col("name"),
      coalesce(col("description"), lit("")).as("description"),
      coalesce(col("owner.id"), lit("")).as("owner_id"),
      coalesce(col("owner.display_name"), lit("")).as("owner_name"),
      coalesce(col("followers.total"), lit(0L)).as("followers"),
      coalesce(col("tracks.total"), lit(0)).as("tracks_total"),
      headOr(col("images.url"), "").as("image_url"),
      coalesce(col("external_urls.spotify"), lit("")).as("spotify_url"),
      col("public"),
      coalesce(col("collaborative"), lit(false)).as("collaborative"))

  /** Playlist tracks from `{track, added_at}` envelopes (P1–P5, P7 +
    * local-track filter F2; Spotify_API4.py:361-388). Parent context
    * (playlist name/owner) arrives via J3 as literal columns. */
  def playlistTracks(bronze: DataFrame, playlistId: Column,
                     playlistName: Column, ownerName: Column): DataFrame =
    bronze
      .filter(col("track.id").isNotNull) // F2: skip local tracks
      .select(
        col("track.id").as("id"),
        col("track.name").as("name"),
        joinedNames(col("track.artists")).as("artists"),
        coalesce(col("track.album.name"), lit("")).as("album_name"),
        coalesce(col("track.duration_ms"), lit(0)).as("duration_ms"),
        durationMin(coalesce(col("track.duration_ms"), lit(0))).as("duration_min"),
        coalesce(col("track.explicit"), lit(false)).as("explicit"),
        coalesce(col("track.popularity"), lit(0)).as("popularity"),
        to_timestamp(col("added_at")).as("added_at"),
        playlistId.as("playlist_id"),
        playlistName.as("playlist_name"),
        ownerName.as("owner_name"),
        coalesce(col("track.preview_url"), lit("")).as("preview_url"),
        coalesce(col("track.external_urls.spotify"), lit("")).as("spotify_url"))

  /** Recommendation tracks (v2's recommendations payload,
    * Spotify_API2.py:270-285): ALL artist names joined (unlike the
    * top-tracks shape, which keeps only the first), album name/release
    * date, popularity, explicit flag. */
  def recommendedTracks(bronze: DataFrame): DataFrame =
    bronze.select(
      col("id"),
      col("name"),
      joinedNames(col("artists")).as("artists"),
      coalesce(col("popularity"), lit(0)).as("popularity"),
      coalesce(col("album.name"), lit("")).as("album_name"),
      col("album.release_date").as("release_date"),
      releaseDateParsed(col("album.release_date")).as("release_dt"),
      coalesce(col("explicit"), lit(false)).as("explicit"))

  /** Categories: 3-column silver table (Spotify_API3.py:296-304). */
  def categories(bronze: DataFrame): DataFrame =
    bronze.select(
      col("id"),
      col("name"),
      headOr(col("icons.url"), "").as("icon_url"))
}

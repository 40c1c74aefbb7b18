package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational._
import graft.sources.Flatten

/** The reference's end-to-end pipelines (SURVEY.md §3) as composed
  * DataFrame programs. Each stage of the Python originals — a driver loop
  * of HTTP fetches feeding pandas concat/dedup/sort — becomes one
  * DataFrame transformation over bronze inputs; the whole pipeline is a
  * single lazy plan per output, so Catalyst sees (and optimizes) the full
  * dataflow: dedup-before-fan-out, top-k-before-enrich, broadcast joins.
  *
  * Bronze inputs are any DataFrames with the payload schemas in
  * [[graft.sources.Schemas]]; fan-out context (which parent a child row
  * was fetched for) is modeled as plain context columns on the bronze
  * frame, exactly the information the reference's loops carried in
  * Python locals.
  */
object Pipelines {

  /** Pipeline-E1 outputs (canonical v3 run,
    * 01_TestingPy/Spotify_API3.py:312-429). */
  final case class E1(
      artists: DataFrame,
      topTracks: DataFrame,
      newReleases: DataFrame,
      categories: DataFrame,
      albumTracks: DataFrame,
      topTrackIds: DataFrame,
      recap: DataFrame)

  /** E1, the canonical pipeline: genre-fan-out artists → dedup → top-20
    * track fan-out → new releases → categories → album-track enrichment →
    * top-100 by popularity → recap.
    *
    * @param artistsBronze    accumulated artist payloads (genre fan-out union)
    * @param topTracksBronze  track payloads + `artist_id` context column
    * @param albumsBronze     new-release album payloads
    * @param categoriesBronze category payloads
    * @param albumTracksBronze track payloads + `album_id` context column
    */
  def e1(spark: SparkSession,
         artistsBronze: DataFrame,
         topTracksBronze: DataFrame,
         albumsBronze: DataFrame,
         categoriesBronze: DataFrame,
         albumTracksBronze: DataFrame): E1 = {

    // dedup artists BEFORE the track fan-out (reference does this too:
    // Spotify_API3.py:124-126 before :348 — the one genuine optimization
    // it hand-codes). First-wins pinned to (popularity desc, id).
    val artists = dedupFirstWins(
      Flatten.artists(artistsBronze), Seq("id"),
      Seq(col("popularity").desc, col("id")))

    val top20 = topK(artists, 20, Seq(col("popularity").desc, col("id")))

    // J2 fan-out as a relational semi join: keep tracks of top-20 artists.
    val topTracks = semiJoin(
      Flatten.tracks(topTracksBronze, artistId = col("artist_id")),
      top20.select(col("id").as("artist_id")), Seq("artist_id"))

    val newReleases = Flatten.albums(albumsBronze)
    val categories = Flatten.categories(categoriesBronze)

    // J1 lookup-enrichment: album name/artists onto each album track,
    // broadcast the (small) release dimension.
    val albumTracks = enrichJoin(
      Flatten.tracks(albumTracksBronze, passthrough = Seq(col("album_id")))
        .withColumnRenamed("album_name", "track_album_name"),
      newReleases.select(col("id").as("nr_id"), col("name").as("album_name"),
                         col("artists").as("album_artists")),
      "album_id", "nr_id")
      .drop("nr_id", "track_album_name")

    // O1+O3: top-100 most popular track ids (the detail-fetch input set).
    val topTrackIds = topK(topTracks.select("id", "popularity"), 100,
      Seq(col("popularity").desc, col("id")))

    val recapDf = recap(Seq(
      "artists" -> artists, "top_tracks" -> topTracks,
      "new_releases" -> newReleases, "categories" -> categories,
      "album_tracks" -> albumTracks))

    E1(artists, topTracks, newReleases, categories, albumTracks,
       topTrackIds, recapDf)
  }

  /** Pipeline-E2 additions (v4 superset, 01_TestingPy/Spotify_API4.py:464-628). */
  final case class E2(
      releases: DataFrame,
      playlists: DataFrame,
      topPlaylists: DataFrame,
      playlistTracks: DataFrame,
      recap: DataFrame)

  /** E2: multi-country release union+dedup, playlist multi-get, top-3
    * playlists by followers, paginated playlist-track extraction with
    * parent context and derived minutes.
    *
    * @param releasesByCountry per-country album payload frames (U2 inputs)
    * @param playlistsBronze   playlist payloads
    * @param playlistItems     `{track, added_at}` envelopes + `playlist_id`
    *                          context column
    */
  def e2(spark: SparkSession,
         releasesByCountry: Map[String, DataFrame],
         playlistsBronze: DataFrame,
         playlistItems: DataFrame): E2 = {

    // U2: per-country fan-out, each branch stamped (P6), union + dedup.
    // DETERMINISTIC first-wins by country order (the reference keeps the
    // first country's row in loop order, Spotify_API4.py:512-523) —
    // dropDuplicates would pick an arbitrary survivor, so an album
    // released in several countries would flip source_country run-to-run.
    val stamped = releasesByCountry.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((country, bronze), i) =>
        Flatten.albums(bronze, sourceCountry = Some(country))
          .withColumn("__pri", lit(i))
    }
    val releases = dedupFirstWins(unionAll(stamped), Seq("id"),
      Seq(col("__pri").asc)).drop("__pri")

    val playlists = Flatten.playlists(playlistsBronze)

    // O2: top-3 playlists by followers.
    val topPlaylists = topK(playlists, 3, Seq(col("followers").desc, col("id")))

    // S4+J3: playlist items (already paginated at ingest) filtered to the
    // top playlists, flattened with parent context broadcast on.
    val items = semiJoin(playlistItems,
      topPlaylists.select(col("id").as("playlist_id")), Seq("playlist_id"))
    val withParent = enrichJoin(items,
      playlists.select(col("id").as("pl_id"), col("name").as("pl_name"),
                       col("owner_name").as("pl_owner")),
      "playlist_id", "pl_id")
    val playlistTracks = Flatten.playlistTracks(withParent,
      playlistId = col("playlist_id"),
      playlistName = col("pl_name"),
      ownerName = col("pl_owner"))

    val recapDf = recap(Seq(
      "releases" -> releases, "playlists" -> playlists,
      "playlist_tracks" -> playlistTracks))

    E2(releases, playlists, topPlaylists, playlistTracks, recapDf)
  }

  // A1 recap comes from Relational.recap (column `table_name`) — a local
  // re-implementation here used to shadow it with a divergent schema.
}

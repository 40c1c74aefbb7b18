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

  /** Pipeline-E3 outputs (v2's fallback + recommendation paths,
    * 01_TestingPy/Spotify_API2.py:61-128, 248-290). */
  final case class E3(
      artists: DataFrame,
      usedFallback: Boolean,
      seedParams: DataFrame,
      recommendations: DataFrame,
      recap: DataFrame)

  /** Max-5 seed truncation (Spotify_API2.py:253-263): the reference
    * silently truncates each seed list to the API's max of 5 and joins
    * with ','. One row, one `param` column. Order pinned to
    * (popularity desc, id) — the reference's Python list order, which is
    * its fetch ranking — via a sorted-struct collect (collect_list alone
    * is shuffle-order-nondeterministic). */
  private def seedParam(seeds: DataFrame): DataFrame =
    seeds.select(struct((-col("popularity")).as("np"), col("id")).as("s"))
      .agg(array_join(
        transform(slice(array_sort(collect_list(col("s"))), 1, 5),
                  x => x.getField("id")), ",").as("param"))

  /** E3: v2's genre-search artists with the featured-playlists FALLBACK,
    * plus seed-based track recommendations with max-5 seed truncation.
    *
    * The fallback branch (Spotify_API2.py:93-116) is an inherently
    * driver-side decision in the reference (`if not all_artists:`) and
    * stays one here — a limit-1 emptiness probe (the S7 discipline from
    * Sinks.writeIfNonEmpty), never a row collect. The fallback dataflow
    * is: top-5 featured playlists → their items → distinct track-artist
    * ids → semi-join into the artist-detail payloads (the S5 batched
    * multi-get output) → artist silver.
    *
    * @param genreArtistsBronze   primary genre-search artist payloads
    *                             (may be empty — that's the trigger)
    * @param featuredPlaylistsBronze fallback featured-playlist payloads
    * @param playlistItems        `{track, added_at}` envelopes +
    *                             `playlist_id` context column
    * @param artistDetailsBronze  artist-detail payloads fetched for the
    *                             fallback ids (S5 multi-get results)
    * @param seedTracks           ranked seed candidates `(id, popularity)`
    * @param seedArtists          ranked seed candidates `(id, popularity)`
    * @param recommendationsBronze recommendation track payloads
    */
  def e3(spark: SparkSession,
         genreArtistsBronze: DataFrame,
         featuredPlaylistsBronze: DataFrame,
         playlistItems: DataFrame,
         artistDetailsBronze: DataFrame,
         seedTracks: DataFrame,
         seedArtists: DataFrame,
         recommendationsBronze: DataFrame): E3 = {

    val primary = dedupFirstWins(
      Flatten.artists(genreArtistsBronze), Seq("id"),
      Seq(col("popularity").desc, col("id")))
    val usedFallback = primary.isEmpty
    val artists =
      if (!usedFallback) primary
      else {
        // limit:5 featured playlists (Spotify_API2.py:96-98), pinned to
        // a deterministic ranking instead of API arrival order
        val featured = topK(Flatten.playlists(featuredPlaylistsBronze), 5,
          Seq(col("followers").desc, col("id")))
        val items = semiJoin(playlistItems,
          featured.select(col("id").as("playlist_id")), Seq("playlist_id"))
        val ids = items
          .select(explode(col("track.artists")).as("a"))
          .select(col("a.id").as("id")).distinct()
        dedupFirstWins(
          semiJoin(Flatten.artists(artistDetailsBronze), ids, Seq("id")),
          Seq("id"), Seq(col("popularity").desc, col("id")))
      }

    val seedParams = seedParam(seedTracks).select(col("param").as("seed_tracks"))
      .crossJoin(seedParam(seedArtists).select(col("param").as("seed_artists")))

    val recommendations = Flatten.recommendedTracks(recommendationsBronze)

    val recapDf = recap(Seq(
      "artists" -> artists, "recommendations" -> recommendations))

    E3(artists, usedFallback, seedParams, recommendations, recapDf)
  }

  /** v1's audio-features enrichment (Spotify_API.py:114-130): per-track
    * feature rows joined onto the track silver by id. The 100-id
    * batching of the reference's fetch loop is the connector's S5
    * concern (`PageClient.fetchByIds`, exercised end-to-end in
    * PipelineSpec); by the time frames exist the enrichment is one
    * broadcast-able lookup join. Tracks with no feature row survive
    * with null features (the reference's merge keeps them too). */
  def withAudioFeatures(tracks: DataFrame, features: DataFrame): DataFrame =
    enrichJoin(tracks, features.withColumnRenamed("id", "af_id"), "id", "af_id")
      .drop("af_id")

  // A1 recap comes from Relational.recap (column `table_name`) — a local
  // re-implementation here used to shadow it with a divergent schema.
}

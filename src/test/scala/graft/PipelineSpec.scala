package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.Pipelines
import graft.sources.Schemas

/** E1/E2 pipeline shapes (SURVEY.md §3) over bronze fixtures. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def bronze(schema: org.apache.spark.sql.types.StructType,
                     rows: String*): DataFrame =
    spark.read.schema(schema).json(rows.toDS)

  private def artist(id: String, pop: Int): String =
    s"""{"id":"$id","name":"artist-$id","popularity":$pop,
        "followers":{"total":${pop * 1000}},"genres":["pop"],
        "images":[{"url":"http://i/$id","height":1,"width":1}]}"""

  private def track(id: String, pop: Int, artistId: String): String =
    s"""{"id":"$id","name":"track-$id","popularity":$pop,"duration_ms":60000,
        "explicit":false,"artists":[{"id":"$artistId","name":"artist-$artistId"}],
        "album":{"id":"alb-$id","name":"album-of-$id","release_date":"2024-02"},
        "artist_id":"$artistId","album_id":"alb-$id"}"""

  private def album(id: String, name: String): String =
    s"""{"id":"$id","name":"$name","artists":[{"id":"a1","name":"A"}],
        "release_date":"2024-03-04","total_tracks":2,"album_type":"album",
        "images":[],"album_id":"$id"}"""

  test("E1: dedup -> top-k fan-out -> enrich -> recap") {
    import org.apache.spark.sql.types._
    // 30 artists with one duplicated id (dup has lower popularity: the
    // first-wins survivor must be the more popular row)
    val artistsRaw = (1 to 30).map(i => artist(f"a$i%02d", i)) :+ artist("a30", 1)
    val trackSchema = Schemas.trackBronze
      .add(StructField("artist_id", StringType))
      .add(StructField("album_id", StringType))
    // tracks for artists a30 (top) and a01 (bottom): only a30's survive top-20
    val tracksRaw = Seq(track("t1", 90, "a30"), track("t2", 10, "a01"))
    val e1 = Pipelines.e1(spark,
      artistsBronze = bronze(Schemas.artistBronze, artistsRaw: _*),
      topTracksBronze = bronze(trackSchema, tracksRaw: _*),
      albumsBronze = bronze(Schemas.albumBronze, album("alb-t1", "NR")),
      categoriesBronze = bronze(Schemas.categoryBronze,
        """{"id":"c1","name":"Pop","icons":[]}"""),
      albumTracksBronze = bronze(trackSchema, track("t1", 90, "a30")))

    assert(e1.artists.count() === 30) // dedup removed 1
    // survivor of the duplicated id is the higher-popularity row
    assert(e1.artists.filter($"id" === "a30").select("popularity")
      .as[Int].head() === 30)
    // only the top-20 artists' tracks survive the semi join
    assert(e1.topTracks.select("id").as[String].collect().toSeq === Seq("t1"))
    // J1 enrichment stamped album name/artists onto the album track
    val at = e1.albumTracks.head()
    assert(at.getAs[String]("album_name") === "NR")
    assert(at.getAs[String]("album_artists") === "A")
    // top-100 detail ids: t1 only
    assert(e1.topTrackIds.select("id").as[String].collect().toSeq === Seq("t1"))
    val recap = e1.recap.as[(String, Long)].collect().toMap
    assert(recap === Map("artists" -> 30L, "top_tracks" -> 1L,
      "new_releases" -> 1L, "categories" -> 1L, "album_tracks" -> 1L))
  }

  test("E1 plans broadcast the enrichment dimension") {
    import org.apache.spark.sql.types._
    val trackSchema = Schemas.trackBronze
      .add(StructField("artist_id", StringType))
      .add(StructField("album_id", StringType))
    val e1 = Pipelines.e1(spark,
      bronze(Schemas.artistBronze, artist("a1", 5)),
      bronze(trackSchema, track("t1", 5, "a1")),
      bronze(Schemas.albumBronze, album("alb-t1", "NR")),
      bronze(Schemas.categoryBronze, """{"id":"c1","name":"Pop","icons":[]}"""),
      bronze(trackSchema, track("t1", 5, "a1")))
    val plan = e1.albumTracks.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("E2: multi-country union+dedup, top-3 playlists, parent-context tracks") {
    val nr = Map(
      "ID" -> bronze(Schemas.albumBronze, album("r1", "X"), album("r2", "Y")),
      "US" -> bronze(Schemas.albumBronze, album("r1", "X"), album("r3", "Z")))
    def playlist(id: String, followers: Long): String =
      s"""{"id":"$id","name":"pl-$id","description":"d",
          "owner":{"id":"u","display_name":"owner-$id"},
          "followers":{"total":$followers},"tracks":{"total":1},
          "images":[],"external_urls":{"spotify":"http://p/$id"},
          "public":true,"collaborative":false}"""
    import org.apache.spark.sql.types._
    val itemSchema = Schemas.playlistItemBronze.add(StructField("playlist_id", StringType))
    def item(trackId: String, plId: String): String =
      s"""{"added_at":"2024-03-01T10:00:00Z","playlist_id":"$plId",
          "track":{"id":"$trackId","name":"n","popularity":1,"duration_ms":61000,
                   "explicit":false,"preview_url":"","artists":[{"id":"a","name":"A"}],
                   "album":{"name":"alb"},"external_urls":{"spotify":""}}}"""

    val e2 = Pipelines.e2(spark,
      releasesByCountry = nr,
      playlistsBronze = bronze(Schemas.playlistBronze,
        (1 to 5).map(i => playlist(s"p$i", i * 100L)): _*),
      playlistItems = bronze(itemSchema,
        item("t1", "p5"), item("t2", "p1"))) // p1 is NOT top-3

    // U2: r1 deduped across countries => 3 distinct releases
    assert(e2.releases.count() === 3)
    // every release carries its source country; the dup keeps one branch
    assert(e2.releases.select("source_country").as[String].collect().toSet
      .subsetOf(Set("ID", "US")))
    // O2: top-3 by followers = p5, p4, p3
    assert(e2.topPlaylists.select("id").as[String].collect().toSeq ===
           Seq("p5", "p4", "p3"))
    // only items of top-3 playlists survive; parent context stamped on (J3)
    val pt = e2.playlistTracks.collect()
    assert(pt.map(_.getAs[String]("id")).toSeq === Seq("t1"))
    assert(pt.head.getAs[String]("playlist_name") === "pl-p5")
    assert(pt.head.getAs[String]("owner_name") === "owner-p5")
    assert(pt.head.getAs[Double]("duration_min") === 1.02)
  }

  private def playlist2(id: String, followers: Long): String =
    s"""{"id":"$id","name":"pl-$id","description":"d",
        "owner":{"id":"u","display_name":"owner-$id"},
        "followers":{"total":$followers},"tracks":{"total":1},
        "images":[],"external_urls":{"spotify":"http://p/$id"},
        "public":true,"collaborative":false}"""

  private def item2(trackId: String, plId: String, artistId: String): String =
    s"""{"added_at":"2024-03-01T10:00:00Z","playlist_id":"$plId",
        "track":{"id":"$trackId","name":"n","popularity":1,"duration_ms":61000,
                 "explicit":false,"preview_url":"",
                 "artists":[{"id":"$artistId","name":"artist-$artistId"}],
                 "album":{"name":"alb"},"external_urls":{"spotify":""}}}"""

  private def recTrack(id: String, pop: Int): String =
    s"""{"id":"$id","name":"rec-$id","popularity":$pop,"duration_ms":60000,
        "explicit":true,
        "artists":[{"id":"a1","name":"A"},{"id":"a2","name":"B"}],
        "album":{"id":"alb-$id","name":"album-$id","release_date":"2024"}}"""

  test("E3 primary path: genre artists found, fallback not taken") {
    import org.apache.spark.sql.types._
    val itemSchema = Schemas.playlistItemBronze.add(StructField("playlist_id", StringType))
    val seeds = Seq.empty[(String, Int)].toDF("id", "popularity")
    val e3 = Pipelines.e3(spark,
      genreArtistsBronze = bronze(Schemas.artistBronze, artist("a1", 7), artist("a1", 3)),
      featuredPlaylistsBronze = bronze(Schemas.playlistBronze, playlist2("p1", 10)),
      playlistItems = bronze(itemSchema, item2("t1", "p1", "fb1")),
      artistDetailsBronze = bronze(Schemas.artistBronze, artist("fb1", 1)),
      seedTracks = seeds, seedArtists = seeds,
      recommendationsBronze = bronze(Schemas.trackBronze, recTrack("r1", 50)))
    assert(!e3.usedFallback)
    // dedup first-wins kept the more popular duplicate
    assert(e3.artists.select("id", "popularity").as[(String, Int)].collect().toSeq
      === Seq(("a1", 7)))
    // empty seed frames -> empty params (reference omits the parameter)
    assert(e3.seedParams.as[(String, String)].head() === (("", "")))
  }

  test("E3 fallback path: playlist-derived artists; seeds truncate to 5") {
    import org.apache.spark.sql.types._
    val itemSchema = Schemas.playlistItemBronze.add(StructField("playlist_id", StringType))
    // 6 featured playlists; only the top-5 by followers are scanned, so
    // p0's artist (fb-miss) must NOT appear
    val featured = (0 to 5).map(i => playlist2(s"p$i", i * 10L))
    val items = Seq(item2("t1", "p5", "fb1"), item2("t2", "p4", "fb2"),
                    item2("t3", "p0", "fb-miss"))
    val details = Seq(artist("fb1", 5), artist("fb2", 9), artist("fb-miss", 1))
    // 7 ranked seeds: only the 5 most popular survive truncation
    val seedTracks = (1 to 7).map(i => (s"t$i", i)).toDF("id", "popularity")
    val e3 = Pipelines.e3(spark,
      genreArtistsBronze = bronze(Schemas.artistBronze), // EMPTY -> fallback
      featuredPlaylistsBronze = bronze(Schemas.playlistBronze, featured: _*),
      playlistItems = bronze(itemSchema, items: _*),
      artistDetailsBronze = bronze(Schemas.artistBronze, details: _*),
      seedTracks = seedTracks,
      seedArtists = Seq(("ar1", 2), ("ar2", 8)).toDF("id", "popularity"),
      recommendationsBronze = bronze(Schemas.trackBronze,
        recTrack("r1", 50), recTrack("r2", 60)))
    assert(e3.usedFallback)
    assert(e3.artists.select("id").as[String].collect().toSet === Set("fb1", "fb2"))
    val (st, sa) = e3.seedParams.as[(String, String)].head()
    assert(st === "t7,t6,t5,t4,t3", s"seed_tracks not truncated to top-5: $st")
    assert(sa === "ar2,ar1")
    // recommendation flatten: all artist names joined, album fields kept
    val r1 = e3.recommendations.filter($"id" === "r1").head()
    assert(r1.getAs[String]("artists") === "A, B")
    assert(r1.getAs[String]("album_name") === "album-r1")
    assert(r1.getAs[Boolean]("explicit"))
    assert(r1.getAs[java.sql.Date]("release_dt").toString === "2024-01-01")
    val recap = e3.recap.as[(String, Long)].collect().toMap
    assert(recap === Map("artists" -> 2L, "recommendations" -> 2L))
  }

  test("audio-features enrichment end-to-end: batched multi-get -> lookup join") {
    // Mirrors v1's get_audio_features flow (Spotify_API.py:114-130): ids
    // in batches of 100 through the S5 multi-get, results become a
    // features frame, then one broadcast lookup join onto the tracks.
    // The endpoint is the synthetic LineFileClient (no egress); the
    // batching, retry path, and join are the production shapes.
    import graft.sources.paged.{LineFileClient, RetryingClient}
    import java.nio.file.Files
    val f = Files.createTempFile("af", ".txt").toFile
    try {
      val lines = (1 to 250).map { i =>
        f"t$i%03d|feat-$i|${i % 100}|ID" // popularity slot stands in for the feature value
      }
      Files.write(f.toPath, String.join("\n", lines: _*).getBytes)
      val client = new RetryingClient(new LineFileClient(f.getPath))
      val trackIds = (1 to 205).map(i => f"t$i%03d")
      // the reference's range(0, len, 100) chunk loop, verbatim semantics
      val fetched = trackIds.grouped(100).flatMap { batch =>
        client.fetchByIds(batch, Array("id", "popularity"))
      }.toSeq
      assert(fetched.length === 205) // 3 batches: 100 + 100 + 5
      val features = fetched.map(r => (r(0), r(1).toInt)).toDF("id", "energy")
      val tracks = Seq(("t001", "song-1"), ("t205", "song-205"), ("t999", "missing"))
        .toDF("id", "name")
      val enriched = Pipelines.withAudioFeatures(tracks, features)
      val byId = enriched.select("id", "energy").as[(String, Option[Int])]
        .collect().toMap
      assert(byId("t001") === Some(1))
      assert(byId("t205") === Some(5))
      assert(byId("t999") === None) // featureless tracks survive with nulls
      val plan = enriched.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    } finally f.delete()
  }
}

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
}

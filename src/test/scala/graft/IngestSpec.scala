package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Flatten, Schemas, Sinks}

/** Bronze→silver flattening (P1–P8) over payload-shaped JSON fixtures,
  * including the edge cases FIXTURES.md §A' calls out: duplicate ids,
  * missing images/external_urls, empty artists array, all three
  * release_date precisions, local-track nulls. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def bronze(schema: org.apache.spark.sql.types.StructType,
                     rows: String*): DataFrame =
    spark.read.schema(schema).json(rows.toDS)

  test("artist flattening: struct field, joined genres, head-or-default image") {
    val df = Flatten.artists(bronze(Schemas.artistBronze,
      """{"id":"a1","name":"A","popularity":88,"followers":{"total":123456789012},
          "genres":["pop","k-pop"],"images":[{"url":"http://i/1","height":640,"width":640}]}""",
      """{"id":"a2","name":"B","popularity":null,"followers":null,"genres":null,"images":[]}"""))
    val r = df.orderBy("id").collect()
    assert(df.columns.toSeq === Seq("id", "name", "popularity", "followers",
                                    "genres", "genres_arr", "image_url"))
    assert(r(0).getLong(3) === 123456789012L) // followers > 2^31 stays exact
    assert(r(0).getString(4) === "pop, k-pop")
    assert(r(0).getString(6) === "http://i/1")
    // null-default policy: '' / 0 like the reference
    assert(r(1).getInt(2) === 0 && r(1).getLong(3) === 0L)
    assert(r(1).getString(4) === "" && r(1).getString(6) === "")
  }

  test("track flattening: conditional first-artist and variable-precision dates") {
    val df = Flatten.tracks(bronze(Schemas.trackBronze,
      """{"id":"t1","name":"X","popularity":70,"duration_ms":200000,"explicit":true,
          "artists":[{"id":"a1","name":"First"},{"id":"a2","name":"Second"}],
          "album":{"id":"al1","name":"Alb","release_date":"2023-05-17"}}""",
      """{"id":"t2","name":"Y","artists":[],
          "album":{"id":"al2","name":"Alb2","release_date":"2023-05"}}""",
      """{"id":"t3","name":"Z","artists":null,
          "album":{"id":"al3","name":"Alb3","release_date":"2023"}}"""),
      artistId = lit("ctx"))
    val r = df.orderBy("id").collect()
    assert(r(0).getAs[String]("artist_name") === "First") // P7: head of array
    assert(r(1).getAs[String]("artist_name") === "Unknown") // empty array
    assert(r(2).getAs[String]("artist_name") === "Unknown") // null array
    // tolerant date parse: first day of period
    val dates = df.orderBy("id").select("release_dt").as[java.sql.Date].collect()
    assert(dates.map(_.toString).toSeq ===
           Seq("2023-05-17", "2023-05-01", "2023-01-01"))
    assert(r.forall(_.getAs[String]("artist_id") === "ctx"))
  }

  test("album flattening appends source_country per fan-out branch") {
    val df = Flatten.albums(bronze(Schemas.albumBronze,
      """{"id":"al1","name":"N","artists":[{"id":"a1","name":"A"},{"id":"a2","name":"B"}],
          "release_date":"2024-01-02","total_tracks":10,"album_type":"album",
          "images":[{"url":"u","height":1,"width":1}]}"""),
      sourceCountry = Some("ID"))
    val r = df.head()
    assert(r.getAs[String]("artists") === "A, B")
    assert(r.getAs[String]("source_country") === "ID")
  }

  test("playlist flattening keeps public nullable, defaults the rest") {
    val df = Flatten.playlists(bronze(Schemas.playlistBronze,
      """{"id":"p1","name":"P","description":null,"owner":{"id":"u1","display_name":"O"},
          "followers":{"total":42},"tracks":{"total":7},"images":null,
          "external_urls":null,"public":null,"collaborative":null}"""))
    val r = df.head()
    assert(r.getAs[String]("description") === "")
    assert(r.getAs[String]("owner_name") === "O")
    assert(r.isNullAt(df.columns.indexOf("public"))) // stays null by design
    assert(r.getAs[Boolean]("collaborative") === false)
    assert(r.getAs[String]("spotify_url") === "")
  }

  test("playlist-track flattening drops local tracks and derives minutes") {
    val df = Flatten.playlistTracks(bronze(Schemas.playlistItemBronze,
      """{"added_at":"2024-03-01T10:00:00Z",
          "track":{"id":"t1","name":"X","popularity":50,"duration_ms":185000,
                   "explicit":false,"preview_url":null,
                   "artists":[{"id":"a1","name":"A"}],
                   "album":{"name":"Alb"},
                   "external_urls":{"spotify":"http://s/t1"}}}""",
      """{"added_at":"2024-03-01T11:00:00Z","track":{"id":null,"name":"local"}}"""),
      playlistId = lit("p1"), playlistName = lit("P"), ownerName = lit("O"))
    assert(df.count() === 1) // F2: the local track (null id) is gone
    val r = df.head()
    assert(r.getAs[Double]("duration_min") === 3.08) // round(185000/60000, 2)
    assert(r.getAs[String]("playlist_name") === "P")
    assert(r.getAs[java.sql.Timestamp]("added_at") !== null)
  }

  test("category flattening takes the first icon") {
    val df = Flatten.categories(bronze(Schemas.categoryBronze,
      """{"id":"c1","name":"Pop","icons":[{"url":"http://i/c1","height":1,"width":1}]}""",
      """{"id":"c2","name":"Rock","icons":[]}"""))
    assert(df.orderBy("id").select("icon_url").as[String].collect().toSeq ===
           Seq("http://i/c1", ""))
  }

  test("csv sink writes a header run directory; empty guard skips") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink").toFile
    try {
      val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
      val path = Sinks.csv(df, tmp.getPath, "artists", "20240101_000000")
      assert(path.endsWith("artists_20240101_000000"))
      val back = spark.read.option("header", "true").csv(path)
      assert(back.count() === 2 && back.columns.toSeq === Seq("k", "v"))
      assert(Sinks.writeIfNonEmpty(df.filter(lit(false)), tmp.getPath, "x", "r").isEmpty)
      // run-partitioned parquet accumulates runs; run_id prunes at scan
      Sinks.parquetRuns(df, tmp.getPath, "t", "r1")
      Sinks.parquetRuns(df, tmp.getPath, "t", "r2")
      val runs = spark.read.parquet(s"${tmp.getPath}/t")
      assert(runs.count() === 4)
      assert(runs.filter(col("run_id") === "r1").count() === 2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }
}

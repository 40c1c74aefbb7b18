package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    ("a", 3, "x"), ("a", 1, "y"), ("b", 2, "z"), ("c", 5, "w"), ("c", 4, "v")
  ).toDF("id", "score", "payload")

  test("dedupByKey keeps exactly one row per key") {
    val out = dedupByKey(people, Seq("id"))
    assert(out.count() === 3)
    assert(col1(out.select("id").orderBy("id")) === Seq("a", "b", "c"))
  }

  test("dedupFirstWins survivor is the minimum under the declared order") {
    val out = dedupFirstWins(people, Seq("id"), Seq(col("score").asc))
      .orderBy("id").select("id", "score").as[(String, Int)].collect().toSeq
    assert(out === Seq(("a", 1), ("b", 2), ("c", 4)))
  }

  test("dedupFirstWins is deterministic across reshuffles") {
    val shuffled = people.repartition(7, col("payload"))
    val a = dedupFirstWins(people, Seq("id"), Seq(col("score").desc)).orderBy("id").collect().toSeq
    val b = dedupFirstWins(shuffled, Seq("id"), Seq(col("score").desc)).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("dedupFirstWinsAgg equals the window form and pre-combines map-side") {
    val viaAgg = dedupFirstWinsAgg(people, Seq("id"), Seq(col("score")))
      .orderBy("id").collect().toSeq
    val viaWindow = dedupFirstWins(people, Seq("id"), Seq(col("score").asc))
      .orderBy("id").collect().toSeq
    assert(viaAgg === viaWindow)
    val plan = dedupFirstWinsAgg(people, Seq("id"), Seq(col("score")))
      .queryExecution.executedPlan.toString
    // the scale claim: partial aggregation before the exchange, no window
    assert(plan.contains("partial_min_by") && !plan.contains("Window"),
      s"expected map-side partial min_by (no window sort) in:\n$plan")
  }

  test("topK equals the k-prefix of a full sort and plans TakeOrderedAndProject") {
    val out = topK(people, 2, Seq(col("score").desc))
    assert(out.select("score").as[Int].collect().toSeq === Seq(5, 4))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k physical op in:\n$plan")
  }

  test("unionAll aligns by name and fills drifted columns with null") {
    val v1 = Seq(("t1", 10)).toDF("id", "popularity")
    val v3 = Seq(("t2", 20, "Artist")).toDF("id", "popularity", "artist_name")
    val out = unionAll(Seq(v1, v3)).orderBy("id")
    assert(out.columns.toSet === Set("id", "popularity", "artist_name"))
    assert(out.select("artist_name").as[Option[String]].collect().toSeq === Seq(None, Some("Artist")))
  }

  test("unionDedup = union-all then key-distinct") {
    val a = Seq(("x", 1), ("y", 2)).toDF("id", "v")
    val b = Seq(("y", 3), ("z", 4)).toDF("id", "v")
    assert(unionDedup(Seq(a, b), Seq("id")).count() === 3)
  }

  test("enrichJoin attaches parent attributes via broadcast hash join") {
    val tracks = Seq(("t1", "al1"), ("t2", "al1"), ("t3", "al9")).toDF("id", "album_id")
    val albums = Seq(("al1", "Album One")).toDF("aid", "album_name")
    val out = enrichJoin(tracks, albums, "album_id", "aid")
    assert(out.count() === 3)
    assert(out.filter($"id" === "t1").select("album_name").as[String].head() === "Album One")
    assert(out.filter($"id" === "t3").select("album_name").collect().head.isNullAt(0))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("semiJoin filters children without shipping parent columns") {
    val tracks = Seq(("t1", "a1"), ("t2", "a2"), ("t3", "a1")).toDF("id", "artist_id")
    val top = Seq(Tuple1("a1")).toDF("artist_id")
    val out = semiJoin(tracks, top, Seq("artist_id"))
    assert(out.columns.toSeq === Seq("id", "artist_id"))
    assert(col1(out.select("id").orderBy("id")) === Seq("t1", "t3"))
  }

  test("decSum is exact where naive double sum drifts") {
    val df = Seq.fill(1000)(0.1).toDF("x")
    val got = df.agg(decSum($"x", 1)).as[Double].head()
    assert(got === 100.0) // naive: 1000 * 0.1 in IEEE order-dependent sum != 100.0 exactly
  }

  test("decAvg is the exact sum over the count") {
    val df = Seq(1.11, 2.22, 3.33).toDF("x")
    assert(df.agg(decAvg($"x", 2)).as[Double].head() === 6.66 / 3)
  }

  test("recap reports one count row per table") {
    val out = recap(Seq("p" -> people, "one" -> Seq(1).toDF("v")))
      .orderBy("table_name").as[(String, Long)].collect().toSeq
    assert(out === Seq(("one", 1L), ("p", 5L)))
  }

  test("recap keeps a 0-count row for an empty table") {
    // Pins the contract a keyed-aggregate restructure would silently
    // break (a groupBy over unioned name projections drops empty
    // tables); the r22 attempt at that shape was reverted on
    // measurement, and this test keeps the contract explicit.
    val out = recap(Seq("p" -> people, "none" -> people.filter(lit(false))))
      .orderBy("table_name").as[(String, Long)].collect().toSeq
    assert(out === Seq(("none", 0L), ("p", 5L)))
  }

  test("saltedAgg equals the plain groupBy and spreads keys over salts") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "rare" else "hot", i.toLong))
      .toDF("k", "v")
    val salted = saltedAgg(df, Seq("k"), salts = 8,
      aggs = Seq((sum($"v"), "ps"), (count(lit(1)), "pn")),
      finals = Seq((sum($"ps"), "total"), (sum($"pn"), "n")))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val plain = df.groupBy("k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(salted === plain)
    // the partial stage must actually split the hot key across salts
    val partials = df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(partials > 1, "hot key not spread across salt partitions")
  }
}

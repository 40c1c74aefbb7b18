package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.paged._

class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def withDataFile(n: Int)(body: String => Unit): Unit = {
    val f = Files.createTempFile("paged", ".txt").toFile
    try {
      val lines = (1 to n).map { i =>
        val market = if (i % 3 == 0) "US" else "ID"
        f"a$i%03d|artist-$i|${i % 100}|$market"
      }
      Files.write(f.toPath, String.join("\n", lines: _*).getBytes)
      body(f.getPath)
    } finally f.delete()
  }

  private def read(path: String, pageSize: Int = 10) =
    spark.read.format("graft.sources.paged.PagedSource")
      .option("path", path).option("pageSize", pageSize).load()

  test("scans all pages in parallel partitions") {
    withDataFile(95) { path =>
      val df = read(path, pageSize = 10)
      assert(df.count() === 95)
      assert(df.rdd.getNumPartitions === 10) // ceil(95/10) page ranges
      assert(df.select("id").as[String].collect().toSet.size === 95)
    }
  }

  test("market equality filter is pushed to the client") {
    withDataFile(30) { path =>
      val df = read(path).filter($"market" === "US")
      assert(df.count() === 10) // every 3rd row
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") || !plan.contains("Filter("),
        s"expected pushed filter in:\n$plan")
      // correctness against unfiltered scan
      assert(df.select("id").as[String].collect().toSet ===
             read(path).collect().filter(_.getAs[String]("market") == "US")
               .map(_.getAs[String]("id")).toSet)
    }
  }

  test("column pruning reaches the reader schema") {
    withDataFile(20) { path =>
      val df = read(path).select("id", "popularity")
      assert(df.schema.fieldNames.toSeq === Seq("id", "popularity"))
      assert(df.as[(String, Int)].collect().length === 20)
      val scan = df.queryExecution.executedPlan.toString
      // the batch scan must not read name/market
      assert(scan.contains("ReadSchema") || scan.contains("id#"),
        s"unexpected plan:\n$scan")
      assert(df.agg(sum("popularity")).as[Long].head() ===
             (1 to 20).map(_ % 100).sum)
    }
  }

  test("limit pushdown caps the planned pages and keeps results exact") {
    withDataFile(95) { path =>
      val limited = read(path, pageSize = 10).limit(7)
      assert(limited.count() === 7)
      // the physical scan fetched ceil(7/10) = 1 page, not 10
      val plan = limited.queryExecution.executedPlan.toString
      assert(plan.contains("PushedLimit=7"), plan)
      // composes with a pushed filter: dense server-side-filtered pages
      val both = read(path, pageSize = 10).filter($"market" === "US").limit(4)
      assert(both.count() === 4)
      assert(both.select("market").distinct().as[String].collect().toSeq === Seq("US"))
    }
  }

  test("retrying client refreshes token on 401 and retries IO errors") {
    class Flaky(inner: PageClient) extends PageClient {
      var calls = 0
      override def total(market: Option[String]): Long = inner.total(market)
      override def fetchPage(o: Long, l: Int, m: Option[String],
                             f: Array[String]): Seq[Array[String]] = {
        calls += 1
        if (calls == 1) throw new UnauthorizedException
        if (calls == 2) throw new java.io.IOException("flaky")
        inner.fetchPage(o, l, m, f)
      }
      override def fetchByIds(ids: Seq[String],
                              f: Array[String]): Seq[Array[String]] =
        inner.fetchByIds(ids, f)
    }
    withDataFile(5) { path =>
      val flaky = new Flaky(new LineFileClient(path))
      val client = new RetryingClient(flaky)
      val rows = client.fetchPage(0, 10, None, Array("id"))
      assert(rows.length === 5)
      assert(flaky.calls === 3) // 401, IOException, success
    }
  }

  test("token provider caches until invalidated") {
    val tp = new TokenProvider(ttlMs = 3600000)
    val t1 = tp.token
    assert(tp.token === t1) // cached
    tp.invalidate()
    // after invalidate a fresh token is minted (may collide on ms; just
    // assert liveness)
    assert(tp.token.nonEmpty)
  }

  test("batched multi-get returns rows for requested ids only (S5)") {
    withDataFile(50) { path =>
      val client = new LineFileClient(path)
      val got = client.fetchByIds(Seq("a001", "a007", "nope"), Array("id", "name"))
      assert(got.map(_(0)).toSet === Set("a001", "a007"))
      assert(got.forall(_.length == 2))
    }
  }
}

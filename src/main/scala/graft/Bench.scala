package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table (parquet footers into page cache) and
    // exercise the common plan shapes once, so the first timed query
    // doesn't absorb JVM/JIT/codegen startup.
    Tables.all(spark, sfDir).values.foreach(df => df.limit(1000).agg(count(lit(1))).collect())
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink, not count(): count() lets Catalyst prune every computed
      // column (a projection-heavy query would bench as a bare row scan)
      // and drop unlimited sorts; the noop writer materializes each row
      // fully with zero sink cost — the honest per-query number.
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // Best-of-2: whichever run JIT/codegen-compilation/page-cache
      // noise lands on, the other run is the query's real cost — one
      // cold pass per query made round-over-round totals a lottery over
      // WHERE warmup landed (r3 charged 27s to q01; r4 spread the same
      // noise over q14/q17/q18/q23).
      val ok =
        try { val t = math.min(once(), once()); Some(t) }
        catch { case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      (name, ok.getOrElse(-1.0), ok.isDefined)
    }
    // failed queries are NOT in the per-query map (a -1.0 sentinel reads
    // as a duration to anything aggregating or plotting it); they're
    // enumerated in `failed` and poison the headline total below
    val qs = results.collect { case (k, v, true) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // headline total = -1 (hard failure) when ANY query failed: summing
    // only successes would let a slow query "improve" the headline by
    // breaking outright. Consumers see the failed list either way.
    val total =
      if (failed.nonEmpty) -1.0
      else results.collect { case (_, t, true) => t }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}

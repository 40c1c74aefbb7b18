package graft

import org.apache.spark.sql.functions._

class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) =
    AdvancedQueries.defs.find(_.name == name).get.run(spark, sf)

  test("q39 sketch: approx_count_distinct within error bound of the exact count") {
    val rows = AdvancedQueries.approxDistinctSketch(spark, sf)
      .select("n_exact", "n_approx").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      // rsd = 0.02; allow 5 sigma so the test is deterministic-in-practice
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.1).toLong),
        s"approx $approx too far from exact $exact")
    }
  }

  test("q41 funnel plans exactly one user_id shuffle (single-pass window cascade)") {
    // The previous three-aggregations-with-joins shape shuffled events
    // three times (one exchange per event_type filter — the filters push
    // below the exchanges, so ReuseExchange can't unify them). The window
    // cascade must carry ONE user_id exchange: this pins the scale
    // property. AQE off so exchanges appear as plain nodes, not stages.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = q("q41_funnel")
      val shuffles = df.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      val onUser = shuffles.filter(_.outputPartitioning.toString.contains("user_id"))
      assert(onUser.size === 1,
        s"expected exactly one user_id exchange, got ${onUser.size}:\n" +
          df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("d55 clusters: every near-dup pair is co-clustered, representative is the min") {
    val pairs = DedupQueries.bigramPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val clusters = q("d55_dup_clusters")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(clusters.nonEmpty)
    // transitivity surrogate: both endpoints of every edge share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // representative = min member of its cluster
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid min is ${members.keys.min}")
    }
  }

  test("TopKAgg keeps k best with deterministic ties (value desc, id asc)") {
    import org.apache.spark.sql.functions.col
    val topk = new graft.operators.TopKAgg(2).toColumn
    val out = Seq(("a", 5.0, 3L), ("a", 5.0, 1L), ("a", 5.0, 2L), ("b", 1.0, 9L))
      .toDF("g", "v", "id").as[(String, Double, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3)).agg(topk)
      .collect().toMap
    assert(out("a") === Seq((5.0, 1L), (5.0, 2L)))
    assert(out("b") === Seq((1.0, 9L)))
  }

  test("d56 contamination: src0 docs are excluded and ratios are in [0,1]") {
    val rows = q("d56_benchmark_contamination")
      .select("doc_id", "n_grams", "n_hit", "contamination")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, h, c) =>
      assert(h <= n && c >= 0.0 && c <= 1.0)
    }
    val src0 = Tables.documents(spark, sf).filter(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet.intersect(src0).isEmpty)
  }

  test("IVF recall vs brute-force ground truth; multi-probe never loses to single-probe") {
    def topk(name: String): Map[Long, Set[Long]] =
      SimilarityQueries.defs.find(_.name == name).get.run(spark, sf)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val truth = topk("s60_ann_bruteforce")
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      hits.sum / hits.size
    }
    val r1 = recall(topk("s64_ann_ivf"))
    val r2 = recall(topk("s65_ann_ivf_multiprobe"))
    assert(r2 >= r1, s"multi-probe recall $r2 < single-probe $r1")
    assert(r2 > 0.2, s"multi-probe recall $r2 implausibly low — probe routing broken?")
  }

  test("q37 banded range join equals the direct theta-join on the same data") {
    val banded = q("q37_range_join_banded")
      .select("a_id", "b_id", "gap_us").as[(Long, Long, Long)].collect().toSet
    val e = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts_us"))
    val theta = e.as("a").join(e.as("b"),
        col("b.user_id") === col("a.user_id") &&
        col("b.ts_us") > col("a.ts_us") &&
        col("b.ts_us") <= col("a.ts_us") + 60000000L)
      .select(col("a.event_id"), col("b.event_id"),
              (col("b.ts_us") - col("a.ts_us")).as("gap_us"))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === theta)
    assert(banded.nonEmpty)
  }
}

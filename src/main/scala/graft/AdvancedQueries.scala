package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{customer, documents, events, lineitem, orders}
import graft.functions.Similarity.{duckShingles, shingles}
import graft.functions.Similarity.duckHexToLong
import graft.operators.Relational.decSum
import graft.operators.TopKAgg

/** Second-wave analytics operators, each with a DuckDB oracle:
  *
  *   - q23 cube                  (multi-dimensional rollup lattice)
  *   - q24 grouping sets         (SQL layer: spark.sql over registered views)
  *   - q25 correlated EXISTS / NOT EXISTS subqueries (SQL layer)
  *   - q37 banded range join     (interval self-join via time-band equality
  *                                keys — the 100 TB shape for theta joins)
  *   - d55 duplicate clusters    (connected components over near-dup pairs
  *                                by alternating large-star/small-star)
  *   - t45 top distinctive term  (tf/df ranking, integer-exact)
  */
object AdvancedQueries {

  /** Identical SQL text runs on Spark and DuckDB (both speak ANSI GROUPING
    * SETS / EXISTS; the decimal-cast sum pattern is exact on both). */
  private val groupingSetsSql = """
        SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY pri, status"""

  private val existsSql = """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey"""

  private val WINDOW_US = 60000000L // 60 s in integer microseconds

  /** d55 core, shared with d59: resolved duplicate clusters
    * `(doc_id, cluster_id)` over the bigram-Jaccard pair edges, via the
    * alternating large-star/small-star algorithm
    * ([[graft.operators.ConnectedComponents]]) — O(log² n) rounds
    * regardless of component diameter. Labels are the component minimum,
    * the same contract min-label propagation had, so the exact recursive
    * CC oracle below is untouched by the algorithm swap. */
  private def dupClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents.run(
      DedupQueries.bigramPairs(s, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))

  /** DuckDB twin of [[dupClusters]] as a CTE prefix ending in a
    * `clusters(doc_id, cluster_id)` CTE — d55 selects it directly, d59
    * anti-joins the corpus against its non-representative members. */
  private val duckClusterCtes: String = s"""
        WITH RECURSIVE pairs AS (
          SELECT doc_a, doc_b FROM (${DedupQueries.duckBigramPairsSql()})
        ),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL
                  SELECT doc_b, doc_a FROM pairs),
        nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
        reach AS (
          SELECT doc_id, doc_id AS r FROM nodes
          UNION
          SELECT e.dst AS doc_id, r.r FROM reach r JOIN edges e ON e.src = r.doc_id
        ),
        clusters AS (SELECT doc_id, MIN(r) AS cluster_id
                     FROM reach GROUP BY doc_id)"""

  /** The sketch half of q39: exact and HLL++ approximate distinct counts
    * side by side. Not in the oracled query set — the sketch value is
    * engine-specific (no DuckDB twin exists); AdvancedSpec pins its
    * relative error against the exact column instead. At 100 TB the
    * sketch is the deployable form: fixed-memory buffers, map-side
    * merge, no shuffle of distinct values. */
  def approxDistinctSketch(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_exact"),
           approx_count_distinct(col("l_partkey"), 0.02).as("n_approx"))
      .orderBy("l_returnflag")

  def defs: Seq[QueryDef] = Seq(

    // ---- q23: CUBE over (returnflag, linestatus) -------------------------
    // The full 2^d rollup lattice in ONE pass: Spark expands grouping sets
    // in the Expand operator before a single hash aggregate — no per-cell
    // re-scan. NULL group markers are coalesced to 'ALL' (group columns
    // are non-null here) so ordering/hashing is null-free on both engines.
    QueryDef("q23_cube",
      (s, dir) => Tables.spread(lineitem(s, dir), col("l_orderkey")) // adaptive: see Tables.spread
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), decSum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ---- q24: GROUPING SETS via the SQL layer ----------------------------
    QueryDef("q24_grouping_sets",
      (s, dir) => {
        orders(s, dir).createOrReplaceTempView("orders")
        s.sql(groupingSetsSql)
      },
      Some(groupingSetsSql)),

    // ---- q25: correlated EXISTS / NOT EXISTS subqueries ------------------
    // Catalyst rewrites these to a left-semi + left-anti join pair — no
    // per-row subquery execution, both sides shuffle once on o_custkey.
    QueryDef("q25_exists_subquery",
      (s, dir) => {
        customer(s, dir).createOrReplaceTempView("customer")
        orders(s, dir).createOrReplaceTempView("orders")
        s.sql(existsSql)
      },
      Some(existsSql)),

    // ---- q37: banded range join (events x events, 60 s window) -----------
    // "Events by the same user within the next 60 s" is a theta join
    // (b.ts in (a.ts, a.ts+60s]) that a naive engine executes as a
    // per-user cross product. The scale path: quantize time into 60 s
    // bands, explode the probe side into its two candidate bands, and
    // equality-join on (user_id, band) — a plain shuffled hash join whose
    // width is bounded by events x 2, then apply the precise range filter.
    // All band/gap math in exact integer microseconds.
    QueryDef("q37_range_join_banded",
      (s, dir) => {
        val e = events(s, dir).select(col("event_id"), col("user_id"), col("ts_us"))
        val a = e.withColumn("band", expr(s"ts_us div $WINDOW_US"))
          .select(col("event_id").as("a_id"), col("user_id"), col("ts_us").as("a_us"), col("band"))
        val b = e
          .withColumn("band", explode(array(expr(s"ts_us div $WINDOW_US"),
                                            expr(s"ts_us div $WINDOW_US - 1"))))
          .select(col("event_id").as("b_id"), col("user_id"), col("ts_us").as("b_us"), col("band"))
        a.join(b, Seq("user_id", "band"))
          .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + WINDOW_US)
          .select(col("a_id"), col("b_id"), col("user_id"), (col("b_us") - col("a_us")).as("gap_us"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
        SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
               b.ts_us - a.ts_us AS gap_us
        FROM e a JOIN e b
          ON b.user_id = a.user_id
         AND b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + $WINDOW_US
        ORDER BY a_id, b_id""")),

    // ---- d55: duplicate-cluster resolution (connected components) --------
    // The step after pair-finding in every dedup pipeline: near-dup PAIRS
    // (d53's bigram-Jaccard edges) become duplicate GROUPS with a
    // deterministic representative (min doc_id in the component).
    // Resolution is alternating large-star/small-star (ConnectedComponents
    // .scala): O(log² n) rounds independent of component diameter, each
    // round a groupBy-min + join over the edge set — so an adversarial
    // edit-chain corpus costs the same rounds as shallow clusters. The
    // driver loop only ever collects per-round convergence scalars; the
    // data never leaves the cluster, which is what makes this shape work
    // on 100 TB.
    QueryDef("d55_dup_clusters",
      (s, dir) => dupClusters(s, dir).orderBy("doc_id"),
      Some(s"""$duckClusterCtes
        SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""")),

    // ---- d59: dedup APPLY — the kept corpus after cluster resolution -----
    // The step every pipeline actually ships: given resolved clusters
    // (d55), keep each cluster's representative (min doc_id) plus all
    // unclustered docs. One anti join of the corpus against the
    // non-representative members — the drop list is bounded by near-dup
    // volume, so at 100 TB AQE broadcasts it and the corpus never
    // shuffles. Output is ids + metadata (the kept-set manifest), not
    // text — the manifest is what downstream shards join against.
    QueryDef("d59_dedup_apply",
      (s, dir) => {
        val drop = dupClusters(s, dir)
          .filter(col("doc_id") =!= col("cluster_id"))
          .select("doc_id")
        documents(s, dir).join(drop, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some(s"""$duckClusterCtes
        SELECT d.doc_id, d.lang, d.source FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
        ORDER BY d.doc_id""")),

    // ---- q38: exact discrete percentiles (SQL-standard inverse dist.) ----
    // percentile_disc RETURNS AN ELEMENT of the data (smallest value with
    // cume_dist >= p) — unlike percentile_cont there is no interpolation
    // arithmetic to drift between engines, so results hash-match exactly.
    // Exact percentiles sort within each group; at 100 TB use this per
    // bounded-cardinality group (as here), approx_percentile otherwise
    // (see q39's sketch discipline).
    QueryDef("q38_percentile_disc",
      // Same aggregate, DataFrame-spelled (r21) so the adaptive spread
      // applies: percentile_disc buffers every group value in its
      // PARTIAL aggregate, and on a starved 1-task scan the whole
      // collection ran single-threaded. Spread parallelizes the partial
      // collection; the 5-group final merge is unchanged. Identical
      // values — the oracle SQL is untouched.
      (s, dir) => Tables.spread(orders(s, dir), col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("p25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"))
        .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.25) AS p25,
               quantile_disc(o_totalprice, 0.5)  AS p50,
               quantile_disc(o_totalprice, 0.9)  AS p90
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q39: exact distinct counts per group (oracled) ------------------
    // The exact half of the distinct-counting pair: COUNT(DISTINCT) must
    // shuffle every distinct value, which is the cost that motivates the
    // sketch. The approximate half — approx_count_distinct, the 100 TB
    // path (an HLL++ sketch aggregating in fixed memory with map-side
    // merge) — is engine-specific and therefore NOT oracle-comparable;
    // it lives in [[approxDistinctSketch]] with its error bound pinned
    // against this query in AdvancedSpec.
    QueryDef("q39_distinct_counts",
      (s, dir) => lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q40: top-k per group via a typed Aggregator ---------------------
    // Same results as the row_number window (the oracle), different
    // physics: the Aggregator keeps an O(k) buffer per group and combines
    // map-side, where the window must shuffle + sort entire groups. For
    // skewed keys at 100 TB that is the difference between a bounded
    // merge and a spilling sort.
    QueryDef("q40_topk_aggregator",
      (s, dir) => {
        import s.implicits._
        val topk = new TopKAgg(3).toColumn
        orders(s, dir)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
          .as[(String, Double, Long)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(topk)
          .flatMap { case (pri, items) =>
            items.zipWithIndex.map { case ((price, key), i) =>
              (pri, key, price, (i + 1).toLong)
            }
          }
          .toDF("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
          .orderBy("o_orderpriority", "rank")
      },
      Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rank
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3 ORDER BY o_orderpriority, rank""")),

    // ---- d56: benchmark-contamination scan -------------------------------
    // The eval-set hygiene operator every training pipeline needs: for
    // each training document, what fraction of its 5-gram shingles
    // appears anywhere in the benchmark corpus (here: source 'src0')?
    // Scale shape: the benchmark's distinct gram-hash set is a small
    // broadcast side; training grams explode once, hit-test via a
    // broadcast LEFT SEMI join, and aggregate per doc — no document
    // pairs, no all-pairs anything. md5-hashed grams keep the oracle
    // bit-identical.
    QueryDef("d56_benchmark_contamination",
      (s, dir) => {
        // The PRE-explode gram-set frame is pinned (r21, Tables.pin):
        // three consumers (bench set, totals, hit-test) re-derived the
        // 5-gram md5 pipeline per branch once the scan was spread (the
        // round-4 "don't cache" measurement materialized the EXPLODED
        // rows through the block manager on a 1-task scan — this pins
        // the compact array form and explodes per consumer, which is
        // cheap relative to hashing).
        val garr = Tables.pin(
          Tables.spread(documents(s, dir), col("doc_id")) // adaptive: see Tables.spread
            .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
            .filter(size(col("w")) >= 5)
            .select(col("doc_id"), col("source"),
              array_distinct(transform(shingles(col("w"), 5),
                x => graft.expressions.Md5Prefix60(x))).as("ga")))
        val grams = garr.select(col("doc_id"), col("source"),
          explode(col("ga")).as("g"))
        val bench = grams.filter(col("source") === "src0").select("g").distinct()
        val train = grams.filter(col("source") =!= "src0")
        // ONE pass over the training grams (r22): the r21 form scanned
        // `train` twice (totals groupBy + the semi-join hit count) and
        // re-joined the two aggregates on doc_id. A LEFT join against
        // the DISTINCT bench set preserves train's row count exactly
        // (each gram matches at most one bench row), so one aggregate
        // computes both: n_grams = count(*), n_hit = count of matched
        // rows — bit-identical to the semi-join count, docs with zero
        // hits get 0 from count() instead of the old coalesce.
        // No broadcast hint (r21): the bench gram set is fixed-size by
        // definition (eval corpora don't grow with training data), so
        // AQE's runtime size check picks the broadcast join on its
        // own at ANY corpus scale — and since `bench` now derives from
        // the pinned gram frame (lineage cut at the checkpoint), an
        // explicit hint would sit outside BroadcastGuard's fact-lineage
        // audit. Unhinted is both the house style and the auditable form.
        train.join(bench.withColumn("hit", lit(1)), Seq("g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
          .select(col("doc_id"), col("n_grams"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_grams")).as("contamination"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        grams AS (SELECT DISTINCT doc_id, source,
                         ${duckHexToLong("md5(shingle)", 15)} AS g
                  FROM (SELECT doc_id, source, unnest(${duckShingles(5)}) AS shingle
                        FROM t WHERE len(w) >= 5)),
        bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
        train AS (SELECT doc_id, g FROM grams WHERE source <> 'src0'),
        totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id),
        hits AS (SELECT doc_id, COUNT(*) AS n_hit
                 FROM train WHERE g IN (SELECT g FROM bench) GROUP BY doc_id)
        SELECT t.doc_id, t.n_grams, COALESCE(h.n_hit, 0) AS n_hit,
               CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_grams AS contamination
        FROM totals t LEFT JOIN hits h ON h.doc_id = t.doc_id
        ORDER BY t.doc_id""")),

    // ---- q41: funnel analysis (ordered sequence matching) ----------------
    // How many users progress view -> click -> purchase IN ORDER? The
    // cascaded-min formulation is exact: stage n's earliest qualifying
    // time is the min event time strictly after stage n-1's. Computed as
    // three chained unbounded windows over ONE user_id partitioning —
    // the previous three-filtered-aggregations-with-joins shape claimed
    // Exchange reuse, but its three exchange subtrees differed (each
    // event_type filter pushes below its exchange), so it really paid
    // three shuffles of events. Here every window and the per-user
    // collapse require the same clustering, so the physical plan carries
    // exactly one user_id exchange and one sort (AdvancedSpec pins the
    // exchange count). Per-user memory is the user's own event rows in
    // the window buffer — bounded by per-user activity, not the corpus.
    QueryDef("q41_funnel",
      (s, dir) => {
        val e = events(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
        val w = Window.partitionBy("user_id")
        e
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts_us"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts_us") > col("t1"),
                     col("ts_us"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
                     col("ts_us"))).over(w))
          // the funnel universe is users with a view (stage 1)
          .filter(col("t1").isNotNull)
          // t2/t3 are per-user constants; any row's value represents the user
          .groupBy("user_id").agg(first("t2").as("t2"), first("t3").as("t3"))
          .select(
            (lit(1L) + when(col("t2").isNotNull, 1L).otherwise(0L)
                     + when(col("t3").isNotNull, 1L).otherwise(0L)).as("funnel_step"))
          .groupBy("funnel_step").agg(count(lit(1)).as("n_users"))
          .orderBy("funnel_step")
      },
      Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t2
               FROM e JOIN s1 ON s1.user_id = e.user_id
               WHERE e.event_type = 'click' AND e.ts_us > s1.t1
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3
               FROM e JOIN s2 ON s2.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
               GROUP BY e.user_id)
        SELECT funnel_step, COUNT(*) AS n_users FROM (
          SELECT 1 + (CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END)
                   + (CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS funnel_step
          FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
                  LEFT JOIN s3 ON s3.user_id = s1.user_id)
        GROUP BY funnel_step ORDER BY funnel_step""")),

    // ---- q45: changelog compaction (CDC latest-wins upsert) --------------
    // Treat events as a changelog keyed by (user_id, event_type): the
    // compacted table keeps each key's LATEST record — the batch upsert/
    // SCD-1 primitive. Same max_by aggregate shape as q05's min_by dedup:
    // map-side partials, one pre-combined row per key per task, no
    // window sort. Tie-break on event_id makes the survivor total-ordered.
    QueryDef("q45_cdc_compact",
      (s, dir) => events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(max_by(struct(col("ts_us"), col("event_id"), col("value")),
                    struct(col("ts_us"), col("event_id"))).as("__r"))
        .select(col("user_id"), col("event_type"),
                col("__r").getField("event_id").as("last_event_id"),
                col("__r").getField("ts_us").as("last_ts_us"))
        .orderBy("user_id", "event_type"),
      Some("""
        SELECT user_id, event_type, last_event_id, last_ts_us FROM (
          SELECT user_id, event_type, event_id AS last_event_id,
                 epoch_us(ts) AS last_ts_us,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type""")),

    // ---- q43: RANGE-frame window (value-based frame, not row-based) ------
    // "Events by this user in the last 30 minutes" needs a RANGE frame:
    // the frame extends by VALUE distance on the ordering key, so ties
    // and gaps are handled correctly where a ROWS frame would miscount.
    // Frame math on integer microseconds; the aggregate is a count —
    // integer-exact on any engine (a double sum over a sliding frame
    // would be at the mercy of accumulation order).
    QueryDef("q43_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-1800000000L, Window.currentRow)
        events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_us"))
          .withColumn("n_last_30m", count(lit(1)).over(w))
          .select("event_id", "user_id", "n_last_30m")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, n_last_30m FROM (
          SELECT event_id, user_id,
                 COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                                RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
                   AS n_last_30m
          FROM events)
        ORDER BY event_id""")),

    // ---- q44: EXCEPT ALL / INTERSECT ALL (bag semantics) -----------------
    // q21/q22 cover the DISTINCT set ops; the ALL variants keep
    // multiplicities (count-based subtraction), a genuinely different
    // semantic Spark implements with a counting aggregate, not a dedup.
    QueryDef("q44_except_all",
      (s, dir) => {
        val li = lineitem(s, dir)
        li.filter(col("l_quantity") >= 30).select("l_orderkey")
          .exceptAll(li.filter(col("l_returnflag") === "R").select("l_orderkey"))
          .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
          .orderBy("l_orderkey")
      },
      Some("""
        SELECT l_orderkey, COUNT(*) AS n FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 30
          EXCEPT ALL
          SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- q42: salted join (hot-key discipline for joins) -----------------
    // q36 demonstrates salting for AGGREGATIONS; this is the JOIN variant:
    // the big (potentially hot-keyed) side gets a deterministic salt, the
    // dimension side is replicated once per salt value, and the join key
    // becomes (key, salt) — a hot key's rows now land in SALT partitions
    // instead of one. AQE's skew-join split handles sort-merge cases at
    // runtime; explicit salting is the portable form that also covers
    // broadcast-ineligible skews and pre-AQE engines. Result is
    // bit-identical to the plain join (each row matches exactly one
    // replica), which is what the oracle checks.
    QueryDef("q42_salted_join",
      (s, dir) => {
        val SALT = 8
        val li = lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
          .withColumn("salt", pmod(col("l_linenumber"), lit(SALT)))
        val o = orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .withColumn("salt", explode(array((0 until SALT).map(lit): _*)))
        li.join(o,
            li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
               decSum(col("l_extendedprice")).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- t46: pattern scrubbing / redaction ------------------------------
    // The PII-hygiene pass every released dataset needs: replace digit
    // runs with a placeholder and report how much changed. Pure per-row
    // projection — zero shuffle, scales with scan width. The pattern set
    // is restricted to syntax Java regex (Spark) and RE2 (DuckDB) treat
    // identically (character classes + quantifiers; no backrefs or
    // lookaround, which RE2 lacks anyway).
    QueryDef("t46_redact",
      (s, dir) => documents(s, dir)
        .select(
          col("doc_id"),
          regexp_replace(col("text"), "[0-9]+", "<NUM>").as("clean_text"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
            .as("n_digit_chars"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS clean_text,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
                 AS n_digit_chars
        FROM documents ORDER BY doc_id""")),

    // ---- t45: top distinctive term per document (tf/df ranking) ----------
    // TF-IDF's ranking decisions without its floating-point score: order
    // by (tf desc, df asc, term) — pure integer/string comparisons, so
    // the oracle matches exactly (a double tf*log(N/df) score would be
    // at the mercy of libm rounding differences across engines).
    QueryDef("t45_top_term",
      (s, dir) => {
        val tok = Tables.spread(documents(s, dir), col("doc_id")) // adaptive: see Tables.spread
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        // df DERIVED from tf (r21): a term's document frequency is
        // exactly its row count in the (doc_id, term) tf aggregate, so
        // the former second tokenize+explode pass and its (doc_id, term)
        // DISTINCT exchange are gone.
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // df as a WINDOW over tf, not a groupBy + self-join (r22): the
        // r21 form consumed tf twice (join input + the dfreq aggregate),
        // and per-branch pushdown re-derived the whole tokenize+tf
        // subtree per consumer — 2x the corpus tokenize CPU (pinning tf
        // was tried in r21 and measured slower: it is corpus-sized,
        // once-per-consumer, the recompute-beats-cache shape).
        // count(*) OVER (PARTITION BY term) on tf rows IS each term's
        // document frequency (tf has one row per (doc, term)), and the
        // window's term exchange replaces the join's — same shuffle
        // count, half the tokenize+aggregate work, no Heaps'-law
        // broadcast question left at all (nothing is ever broadcast).
        val wdf = Window.partitionBy("term")
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)
        tf.withColumn("df", count(lit(1)).over(wdf))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "term", "tf", "df")
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df
               FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term)
        SELECT doc_id, term, tf, df FROM (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
          FROM tf JOIN df USING (term))
        WHERE rn = 1 ORDER BY doc_id""")))
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Relational._
import graft.Tables._
import graft.Tables.spread

/** The reference-surface relational suite (SURVEY.md §2) over the driver
  * star schema, every query with a DuckDB oracle.
  *
  * Scale discipline applied throughout: dimension sides of joins are
  * explicitly broadcast, top-k goes through TakeOrderedAndProject (never a
  * full sort), aggregates are map-side-combined decimal sums, and nothing
  * ever collects to the driver. The trailing `orderBy` on each query exists
  * only to make the dumped parquet deterministic for the oracle compare —
  * a production caller would drop it.
  */
object RelationalQueries {

  private def dec2(c: Column) = c.cast(DecimalType(18, 2))
  private def dec4(c: Column) = c.cast(DecimalType(18, 4))
  // Scale rule: a product of k two-decimal factors has exactly 2k decimal
  // digits; casting the double to a decimal of scale >= 2k never rounds, so
  // Spark (HALF_UP) and DuckDB (HALF_EVEN) cannot disagree on ties.
  private def dec6(c: Column) = c.cast(DecimalType(18, 6))

  /** Exact, engine-portable SUM of a double expression (see Relational.decSum). */
  private val SUM2 = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private val SUM4 = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  private val SUM6 = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"
  private val AVG2 = (x: String) => s"${SUM2(x)} / COUNT(*)"

  def defs: Seq[QueryDef] = Seq(

    // ---- Aggregation: TPC-H Q1-shaped pricing summary (groupBy + many aggs;
    //      reference analytics layer per SURVEY.md §2.5/§7.1-5) ------------
    QueryDef("q01_pricing_summary",
      // Adaptive spread (r21, Tables.spread): the decimal partial
      // aggregation over every lineitem row ran inside the starved
      // 1-task scan. Spread is the identity at cluster scale, where the
      // scan itself is wide and partials stay map-side as documented.
      (s, dir) => spread(lineitem(s, dir), col("l_orderkey"))
        .filter(expr("l_shipdate < TIMESTAMP_NTZ '1999-01-01 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double").as("sum_disc_price"),
          sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).cast("double").as("sum_charge"),
          decAvg(col("l_quantity")).as("avg_qty"),
          decAvg(col("l_extendedprice")).as("avg_price"),
          decAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${SUM2("l_quantity")} AS sum_qty,
               ${SUM2("l_extendedprice")} AS sum_base_price,
               ${SUM4("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               ${SUM6("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               ${AVG2("l_quantity")} AS avg_qty,
               ${AVG2("l_extendedprice")} AS avg_price,
               ${AVG2("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- Projection + derived + conditional column (P1/P5/P7:
    //      Spotify_API4.py:379, Spotify_API3.py:150) ----------------------
    QueryDef("q02_project_derive",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_returnflag") === "A")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double").as("revenue"),
          when(col("l_quantity") >= 25, "bulk").otherwise("small").as("qty_class"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
               CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class
        FROM lineitem WHERE l_returnflag = 'A'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- Filter pushdown to parquet (F1/F3: Spotify_API3.py:383, :56-61) -
    QueryDef("q03_filter_pushdown",
      (s, dir) => part(s, dir)
        .filter(col("p_brand") === "Brand#13" && col("p_size") >= 25)
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
        .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, p_name, p_size, p_retailprice
        FROM part WHERE p_brand = 'Brand#13' AND p_size >= 25
        ORDER BY p_partkey""")),

    // ---- Top-k (O1/O2: Spotify_API4.py:542) — TakeOrderedAndProject ------
    QueryDef("q04_topk",
      (s, dir) => topK(customer(s, dir), 10,
          Seq(col("c_acctbal").desc, col("c_custkey").asc))
        .select("c_custkey", "c_name", "c_acctbal"),
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10""")),

    // ---- Deterministic first-wins dedup (A2: Spotify_API3.py:124-126) ----
    QueryDef("q05_dedup_first_wins",
      // hash-aggregate survivor selection (min_by), not window sort — see
      // Relational.dedupFirstWinsAgg for the scale rationale
      (s, dir) => dedupFirstWinsAgg(orders(s, dir), Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"),
                col("o_orderdate").cast("date").as("first_order_date"))
        .orderBy("o_custkey"),
      Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_order_date
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders) WHERE rn = 1
        ORDER BY o_custkey""")),

    // ---- Union-all + dedup-by-key (U1/U2: Spotify_API4.py:512-523) -------
    QueryDef("q06_union_dedup",
      (s, dir) => {
        val o = orders(s, dir)
        unionDedup(Seq(
            o.filter(col("o_totalprice") > 400000).select("o_orderkey", "o_orderstatus"),
            o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_orderstatus")),
          Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT DISTINCT o_orderkey, o_orderstatus
        FROM (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
              UNION ALL
              SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY o_orderkey""")),

    // ---- Broadcast enrichment join + agg (J1: Spotify_API3.py:382-390) ---
    QueryDef("q07_enrich_join",
      (s, dir) => enrichJoin(lineitem(s, dir), part(s, dir),
          "l_partkey", "p_partkey", "inner")
        .groupBy("p_brand")
        .agg(decSum(col("l_extendedprice")).as("sum_price"),
             count(lit(1)).as("n_items"))
        .orderBy("p_brand"),
      Some(s"""
        SELECT p_brand, ${SUM2("l_extendedprice")} AS sum_price, COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- Left-semi join (J2 fan-out as relation: Spotify_API3.py:343-351)
    // No broadcast hint on `urgent`: it is a constant FRACTION of a fact
    // table (~1/5 of orders), so it grows with the dataset — a forced
    // broadcast overrides AQE's size check and OOMs executors at 100x
    // scale. Unhinted, AQE broadcasts only when the measured side fits,
    // else plans a shuffled semi join (BroadcastGuard enforces this).
    QueryDef("q08_semi_join",
      (s, dir) => {
        val urgent = orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        lineitem(s, dir)
          .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Left-anti join (customers with no pending orders) ---------------
    QueryDef("q09_anti_join",
      (s, dir) => customer(s, dir)
        .join(orders(s, dir).filter(col("o_orderstatus") === "P").select("o_custkey"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      // NOT EXISTS, not NOT IN: NOT IN collapses to zero rows if the
      // subquery ever yields a NULL key, where left_anti (and NOT EXISTS)
      // keep every unmatched row — the oracle must share anti-join
      // semantics exactly.
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        ORDER BY c_custkey""")),

    // ---- Multiway join, broadcast dims (TPC-H Q5 shape) ------------------
    QueryDef("q10_revenue_by_nation",
      (s, dir) => {
        val rev = dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))
        lineitem(s, dir)
          .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, dir).filter(col("r_name") === "ASIA")),
                col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""
        SELECT n_name, ${SUM4("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    // ---- Window: rank within group (top-3 parts per brand) ---------------
    QueryDef("q11_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        part(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("p_brand", "p_partkey", "p_retailprice")
          .orderBy("p_brand", "p_partkey")
      },
      Some("""
        SELECT p_brand, p_partkey, p_retailprice
        FROM (SELECT p_brand, p_partkey, p_retailprice,
                     ROW_NUMBER() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey) AS rn
              FROM part) WHERE rn <= 3
        ORDER BY p_brand, p_partkey""")),

    // ---- Window: running aggregate (cumulative spend per customer) -------
    QueryDef("q12_window_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, dir)
          .withColumn("running_spend", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "running_spend")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- Conditional classification + agg (P7 CASE WHEN) -----------------
    QueryDef("q13_case_classify",
      (s, dir) => orders(s, dir)
        .withColumn("size_class",
          when(col("o_totalprice") >= 300000, "large")
            .when(col("o_totalprice") >= 100000, "medium")
            .otherwise("small"))
        .groupBy("size_class")
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total"))
        .orderBy("size_class"),
      Some(s"""
        SELECT CASE WHEN o_totalprice >= 300000 THEN 'large'
                    WHEN o_totalprice >= 100000 THEN 'medium'
                    ELSE 'small' END AS size_class,
               COUNT(*) AS n, ${SUM2("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY size_class""")),

    // ---- String functions (X2/X3: Spotify_API.py:83,144,162) -------------
    QueryDef("q14_string_funcs",
      (s, dir) => customer(s, dir)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
          length(col("c_name")).cast("long").as("name_len"))
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, UPPER(c_name) AS name_upper,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CONCAT_WS('|', c_mktsegment, c_name) AS tagged,
               CAST(LENGTH(c_name) AS BIGINT) AS name_len
        FROM customer ORDER BY c_custkey""")),

    // ---- Date parts + monthly rollup (X4: Spotify_API.py:161) ------------
    QueryDef("q15_date_parts",
      (s, dir) => orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
                 month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total"))
        .orderBy("o_year", "o_month"),
      Some(s"""
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
               COUNT(*) AS n, ${SUM2("o_totalprice")} AS total
        FROM orders GROUP BY o_year, o_month ORDER BY o_year, o_month""")),

    // ---- Left-outer join + COALESCE default (P3/P4:
    //      Spotify_API.py:84, Spotify_API4.py:380-387) ---------------------
    QueryDef("q16_outer_coalesce",
      (s, dir) => {
        val cnt = orders(s, dir).groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        customer(s, dir)
          .join(cnt, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
        FROM customer LEFT JOIN
             (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) t
             ON c_custkey = o_custkey
        ORDER BY c_custkey""")),

    // ---- Recap report (A1: Spotify_API3.py:424-429) ----------------------
    QueryDef("q17_recap_counts",
      (s, dir) => recap(Tables.all(s, dir).toSeq.sortBy(_._1)).orderBy("table_name"),
      Some(Seq("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings")
        .map(t => s"SELECT '$t' AS table_name, COUNT(*) AS n FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY table_name"))),

    // ---- ROLLUP (analytics beyond the reference, SURVEY.md §2.5) ---------
    QueryDef("q18_rollup",
      (s, dir) => orders(s, dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("n"), col("total"))
        .orderBy("status", "priority"),
      Some(s"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n, ${SUM2("o_totalprice")} AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- Exact distinct counts ------------------------------------------
    QueryDef("q19_distinct_count",
      (s, dir) => lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Scalar subquery via broadcast (orders above 1.5x exact mean) ----
    QueryDef("q20_scalar_subquery",
      (s, dir) => {
        val o = orders(s, dir)
        val avgDf = o.agg((decSum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
        o.join(broadcast(avgDf))
          .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some(s"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (SELECT ${SUM2("o_totalprice")} / COUNT(*) FROM orders)
        ORDER BY o_orderkey""")),

    // ---- Set ops: INTERSECT / EXCEPT -------------------------------------
    QueryDef("q21_intersect",
      (s, dir) => {
        val o = orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey""")),

    QueryDef("q22_except",
      (s, dir) => {
        val o = orders(s, dir)
        o.filter(col("o_orderstatus") === "P").select("o_custkey")
          .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_custkey""")),

    // ---- Salted two-stage aggregation (skew discipline) -------------------
    // Same answer as the plain GROUP BY (the oracle IS the plain GROUP
    // BY); the salted plan splits each group key over 16 partial reducers
    // first, which is what keeps a skewed key (one dominant returnflag at
    // 100 TB) from serializing on a single task. Decimal partials keep the
    // two-stage sum exact.
    QueryDef("q36_salted_agg",
      (s, dir) => saltedAgg(
        lineitem(s, dir).select("l_returnflag", "l_quantity"),
        keys = Seq("l_returnflag"), salts = 16,
        aggs = Seq(
          (sum(col("l_quantity").cast(DecimalType(18, 2))), "ps"),
          (count(lit(1)), "pn")),
        finals = Seq(
          (sum(col("ps")).cast("double"), "sum_qty"),
          (sum(col("pn")), "n")))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's relational operator surface (SURVEY.md §2), re-expressed
  * as thin, tested Spark primitives. Each wrapper is one declarative Spark
  * call so Catalyst keeps full optimization freedom (pushdown, pruning,
  * join selection, AQE); the value added is (a) pinned-down semantics the
  * reference leaves implicit — e.g. deterministic first-wins dedup — and
  * (b) a stable API with per-operator tests.
  *
  * Scale notes are on each operator: everything here is shuffle-minimal and
  * driver-collect-free, so the same code runs on local[32] and on a
  * 1000-executor cluster against 100 TB.
  */
object Relational {

  /** Distinct-by-key, arbitrary survivor — pandas `drop_duplicates(subset)`
    * when insertion order is irrelevant (reference:
    * 01_TestingPy/Spotify_API3.py:126). One hash-aggregate shuffle on the
    * key; partial (map-side) aggregation bounds the shuffle volume by the
    * number of distinct keys, not rows.
    */
  def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Distinct-by-key, deterministic first-wins — pandas `drop_duplicates`
    * keeps the first row in insertion order (reference:
    * 01_TestingPy/Spotify_API3.py:124-126). Spark has no insertion order,
    * so "first" must be declared: the survivor is the minimum row under
    * `order`. Window + row_number = one shuffle on the key, then a
    * per-key-partition sort. NOTE: AQE does NOT split skewed window
    * partitions (its skew mitigation is join-only), so a hot key sorts
    * on one task — under key skew prefer [[dedupFirstWinsAgg]], whose
    * per-key state is one row.
    */
  def dedupFirstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** First-wins dedup as an AGGREGATE: min_by(row, order-struct) keeps
    * one survivor per key with O(1) state and MAP-SIDE PARTIALS (the plan
    * shows partial_min_by before the exchange; struct buffers make it a
    * SortAggregate on the group key, not a hash aggregate, but the sort
    * is on the key only). The window form above must shuffle every row
    * and sort whole groups by the full order — at 100 TB under key skew
    * that's a spilling sort, while this form shuffles one pre-combined
    * row per key per map task. Same result when `order` is a total
    * order (struct comparison is lexicographic); `RelationalSpec` pins the
    * equivalence. `order` columns are PLAIN ascending columns (min_by
    * semantics) — use the window form for descending/mixed orders or
    * ranks beyond 1. */
  def dedupFirstWinsAgg(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val survivor = df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(df.columns.map(col): _*), struct(order: _*)).as("__r"))
    // getField, not col("__r.name"): safe for column names containing dots
    survivor.select(df.columns.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Top-k by ordering — `sort_values(...).head(k)` (reference:
    * 01_TestingPy/Spotify_API4.py:542). Catalyst plans this as
    * TakeOrderedAndProject: each task keeps a k-sized heap, only k rows per
    * partition reach the driver-side merge — O(k) network, never a full
    * sort. Exactly the plan you want at 100 TB.
    */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Union-all of schema-aligned frames — the reference's accumulate-by-
    * concat loops (01_TestingPy/Spotify_API.py:187,193). `unionByName`
    * aligns by column name, not position; `allowMissingColumns` covers the
    * reference's schema drift between pipeline versions (v3 adds
    * artist_name, 01_TestingPy/Spotify_API3.py:150). Union is a no-shuffle
    * operator in Spark.
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Union + dedup by key — UNION DISTINCT by key over per-country frames
    * (reference: 01_TestingPy/Spotify_API4.py:512-523). */
  def unionDedup(dfs: Seq[DataFrame], keys: Seq[String]): DataFrame =
    dedupByKey(unionAll(dfs), keys)

  /** Lookup-enrichment join — child rows enriched with parent attributes
    * (reference: 01_TestingPy/Spotify_API3.py:382-390, album name/artists
    * onto album tracks). The parent side is explicitly broadcast: at any
    * scale where the dimension fits in executor memory this avoids
    * shuffling the (huge) child side entirely.
    */
  def enrichJoin(child: DataFrame, parent: DataFrame,
                 childKey: String, parentKey: String,
                 joinType: String = "left"): DataFrame =
    child.join(broadcast(parent), child(childKey) === parent(parentKey), joinType)

  /** Filter children to those having a parent — the reference's fan-out
    * "join" (fetch tracks only for top artists,
    * 01_TestingPy/Spotify_API3.py:343-351) is relationally a left-semi
    * join. Semi joins ship no payload columns from the right side.
    */
  def semiJoin(child: DataFrame, parent: DataFrame, keys: Seq[String]): DataFrame =
    child.join(parent, keys, "left_semi")
      // left_semi returns only child columns, but a using-columns join
      // moves the key columns first — re-select to preserve the child's
      // declared column ORDER (pinned by RelationalSpec).
      .select(child.columns.map(col).toIndexedSeq: _*)

  /** Exact decimal sum of a double column, returned as double.
    *
    * Doubles summed in different orders differ in low bits, so a Spark
    * result and a DuckDB oracle would hash-mismatch. Casting each element
    * to DECIMAL(18,2) first makes the sum exact and order-independent;
    * the final cast back to double is then identical on both engines.
    * (Decimal aggregation is still codegen'd and map-side-combined.)
    */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average: exact decimal sum divided by count, in double.
    * Both operands are bit-identical across engines, so the IEEE division
    * result is too (unlike built-in AVG, whose accumulation order varies).
    */
  def decAvg(c: Column, scale: Int = 2): Column =
    decSum(c, scale) / count(lit(1))

  /** Recap/summary report — the reference's "REKAPITULASI" row-count block
    * (01_TestingPy/Spotify_API3.py:424-429) as a DataFrame: one row per
    * table with its count (0 for an empty table). Counts are computed
    * distributed and unioned.
    *
    * Shape note (r22): a single-exchange alternative (union the name
    * projections, one keyed aggregate, left-join the name list back for
    * empty tables) was built and measured ~25% SLOWER at sf0.1 — the ten
    * single-row count-merge Exchanges here are trivial, and the
    * alternative's broadcast-join stage costs more than it saves. The
    * ten per-table count stages are independent, so the DAG scheduler
    * already runs them concurrently inside the one union job; shuffled
    * bytes are identical either way (one partial-count row per scan
    * partition). Kept in this form deliberately.
    */
  def recap(tables: Seq[(String, DataFrame)]): DataFrame =
    unionAll(tables.map { case (name, df) =>
      df.groupBy().agg(count(lit(1)).as("n")).select(lit(name).as("table_name"), col("n"))
    })

  /** Two-stage salted aggregation for skewed group keys. A single hot key
    * (one language dominating 100 TB of documents, one power user in an
    * event stream) funnels its entire partition through one reducer in a
    * plain groupBy; salting splits each key across `salts` reducers for
    * the partial aggregate, then merges the (keys x salts)-sized partials.
    * Results are identical to the unsalted groupBy for any commutative
    * merge (sums, counts, min/max); the salt is a deterministic row hash,
    * so re-runs and speculative retries agree. AQE's skew handling covers
    * joins; aggregation skew still needs this.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[(Column, String)], finals: Seq[(Column, String)]): DataFrame = {
    // Salt must be independent of row CONTENT: hashing the row would give
    // identical rows (key-only projections, duplicate events) one constant
    // salt and re-serialize the hot key on a single reducer. Sequential
    // per-partition ids round-robin every row — including duplicates —
    // across all `salts` partial groups. Nondeterministic across task
    // retries, which is safe here: the operator requires decomposable
    // (associative/commutative) aggregates, so WHICH partial a row lands
    // in never changes the final result.
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._1.as(aggs.head._2),
           aggs.tail.map { case (c, n) => c.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finals.head._1.as(finals.head._2),
           finals.tail.map { case (c, n) => c.as(n) }: _*)
  }
}

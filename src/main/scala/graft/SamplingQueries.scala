package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.documents

/** Deterministic sampling operators — training-data pipeline staples
  * (carve out eval sets, subsample for ablations) that must be
  * **reproducible across engines and re-runs**, which rules out
  * `df.sample()` (partition-order dependent). Every sampler keys on
  * md5(doc_id), so any engine — Spark at 100 TB or DuckDB over one file —
  * selects the identical row set.
  *
  * Scale: s70 is TakeOrderedAndProject (per-partition k-heap, O(k) driver
  * merge — no full sort); s71 is a pure map-side filter with no shuffle at
  * all, and composes with parquet scans of any width.
  */
object SamplingQueries {

  private def h(prefix: String) =
    md5(concat(lit(prefix), col("doc_id").cast("string")))

  def defs: Seq[QueryDef] = Seq(

    // ---- s70: fixed-size deterministic sample (top-k by hash) ------------
    QueryDef("s70_hash_sample",
      (s, dir) => documents(s, dir)
        .orderBy(h("sample|"), col("doc_id"))
        .limit(200)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id, lang, source FROM (
          SELECT doc_id, lang, source FROM documents
          ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id LIMIT 200)
        ORDER BY doc_id""")),

    // ---- s71: rate-based deterministic Bernoulli sample (hash cutoff) ----
    // P(select) = 0x2000/0x10000 = 12.5%, decided per row with no shuffle.
    QueryDef("s71_bernoulli_sample",
      (s, dir) => documents(s, dir)
        .filter(conv(substring(h("bern|"), 1, 4), 16, 10).cast("long") < 8192L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang"),
      Some("""
        SELECT lang, COUNT(*) AS n_sampled FROM documents
        WHERE (strpos('0123456789abcdef', substr(md5('bern|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5('bern|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5('bern|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5('bern|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) < 8192
        GROUP BY lang ORDER BY lang""")),

    // ---- s72: fixed-size stratified sample (k per stratum, by hash) ------
    // Balanced sampling for training-data curation: exactly min(k, |g|)
    // rows per (lang, source) stratum, chosen by md5 rank — deterministic
    // on any engine. One shuffle on the stratum key; per-stratum state is
    // a k-row heap, so skewed strata can't blow memory. (A rate-based
    // stratified sampler would be s71 with per-group rates; fixed-size is
    // the harder, more useful shape.)
    QueryDef("s72_stratified_sample",
      (s, dir) => {
        val w = Window.partitionBy("lang", "source")
          .orderBy(h("strat|"), col("doc_id"))
        documents(s, dir)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 20)
          .select("lang", "source", "rk", "doc_id")
          .orderBy("lang", "source", "rk")
      },
      Some("""
        SELECT lang, source, rk, doc_id FROM (
          SELECT lang, source, doc_id,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
          FROM documents)
        WHERE rk <= 20 ORDER BY lang, source, rk""")),

    // ---- s73: weighted domain-mixture sample (per-source rates) ----------
    // The training-recipe operator: each source contributes at its own
    // rate (the "mixture weights" of a data recipe). Rates here derive
    // deterministically from the source index — src<i> samples at
    // ((i mod 5) + 1) x 10% — standing in for a configured weights
    // table; a real recipe would broadcast a tiny rates dim instead of
    // computing the cutoff inline. The selection itself stays s71's
    // pure map-side hash cutoff: per-row decision, no shuffle, no join,
    // reproducible on any engine — so re-running the recipe (or
    // backfilling a shard) selects the identical rows at 100 TB.
    QueryDef("s73_mixture_sample",
      (s, dir) => documents(s, dir)
        .withColumn("cut",
          (expr("CAST(substring(source, 4) AS BIGINT)") % 5 + 1) * lit(6554L))
        .filter(conv(substring(h("mix|"), 1, 4), 16, 10).cast("long") < col("cut"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("source"),
      Some("""
        SELECT source, COUNT(*) AS n_sampled FROM documents
        WHERE (strpos('0123456789abcdef', substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
            < (CAST(substr(source, 4) AS BIGINT) % 5 + 1) * 6554
        GROUP BY source ORDER BY source""")))
}

package graft

import org.apache.spark.sql.functions._

import graft.Tables.documents
import graft.functions.Similarity.shingles
import graft.functions.TextAnalysis._

/** Text-analysis suite over `documents`: token statistics, language ID,
  * quality scoring, exact fingerprinting. Every operator is a per-row
  * projection (embarrassingly parallel, zero shuffle) except the final
  * aggregations, whose shuffle width is bounded by group cardinality —
  * exactly what you want scanning 100 TB of raw text.
  */
object TextQueries {

  /** DuckDB-side marker-count snippet, mirroring TextAnalysis.markerCount. */
  private def duckMarker(ms: Seq[String]): String =
    s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))) AS BIGINT)"

  private val duckLangCounts: String =
    graft.functions.TextAnalysis.langMarkers
      .map { case (lang, ms) => s"${duckMarker(ms)} AS n_$lang" }
      .mkString(",\n               ")

  /** t43's stopword set, derived from the SAME source the Spark side
    * reads (langMarkers.head = English) — a hardcoded copy would silently
    * desynchronize the oracle if the lexicon changes. */
  private val duckStop: String =
    graft.functions.TextAnalysis.langMarkers.head._2
      .map(m => s"'$m'").mkString(",")

  def defs: Seq[QueryDef] = Seq(

    // ---- Token statistics (token counting: whitespace + BPE-ish) --------
    QueryDef("t40_token_stats",
      (s, dir) => documents(s, dir)
        .select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          subwordCount(col("text")).as("n_subwords"),
          length(col("text")).cast("long").as("n_chars_text"),
          meanTokenLen(col("text")).as("mean_tok_len"),
          uniqueRatio(col("text")).as("uniq_ratio"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_subwords,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_text,
               CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS mean_tok_len,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS uniq_ratio
        FROM documents ORDER BY doc_id""")),

    // ---- Language ID: marker-lexicon argmax ------------------------------
    QueryDef("t41_lang_id",
      (s, dir) => documents(s, dir)
        .select(col("doc_id"), col("lang"), langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id, lang,
               CASE WHEN n_en = m AND m > 0 THEN 'en'
                    WHEN n_es = m AND m > 0 THEN 'es'
                    WHEN n_de = m AND m > 0 THEN 'de'
                    WHEN n_fr = m AND m > 0 THEN 'fr'
                    ELSE 'unknown' END AS lang_pred
        FROM (SELECT doc_id, lang, n_en, n_es, n_de, n_fr,
                     GREATEST(n_en, n_es, n_de, n_fr) AS m
              FROM (SELECT doc_id, lang,
               $duckLangCounts
                    FROM documents))
        ORDER BY doc_id""")),

    // ---- Language-ID agreement report (aggregated confusion) ------------
    QueryDef("t42_lang_agreement",
      (s, dir) => documents(s, dir)
        .select(col("lang"), langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred"),
      Some(s"""
        SELECT lang,
               CASE WHEN n_en = m AND m > 0 THEN 'en'
                    WHEN n_es = m AND m > 0 THEN 'es'
                    WHEN n_de = m AND m > 0 THEN 'de'
                    WHEN n_fr = m AND m > 0 THEN 'fr'
                    ELSE 'unknown' END AS lang_pred,
               COUNT(*) AS n
        FROM (SELECT lang, n_en, n_es, n_de, n_fr,
                     GREATEST(n_en, n_es, n_de, n_fr) AS m
              FROM (SELECT lang,
               $duckLangCounts
                    FROM documents))
        GROUP BY lang, lang_pred ORDER BY lang, lang_pred""")),

    // ---- Quality scoring + keep/drop decision ----------------------------
    QueryDef("t43_quality_score",
      (s, dir) => documents(s, dir)
        .select(
          col("doc_id"),
          stopwordRatio(col("text")).as("stop_ratio"),
          qualityScore(col("text")).as("quality"),
          when(qualityScore(col("text")) >= 0.5, "keep").otherwise("drop").as("decision"))
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id, stop_ratio, quality,
               CASE WHEN quality >= 0.5 THEN 'keep' ELSE 'drop' END AS decision
        FROM (
          SELECT doc_id,
                 CAST(len(list_filter(toks, x -> x IN ($duckStop))) AS BIGINT)
                   / CAST(CAST(len(toks) AS BIGINT) AS DOUBLE) AS stop_ratio,
                 0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                 + 0.3 * (CAST(len(list_filter(toks, x -> x IN ($duckStop))) AS BIGINT)
                          / CAST(CAST(len(toks) AS BIGINT) AS DOUBLE))
                 + 0.3 * ((CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(toks)) / 10.0)
                   AS quality
          FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))
        ORDER BY doc_id""")),

    // ---- Exact fingerprint + per-fingerprint keeper ----------------------
    QueryDef("t44_fingerprint",
      (s, dir) => documents(s, dir)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper_doc_id"))
        .orderBy("fp"),
      Some("""
        SELECT md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp,
               COUNT(*) AS n_dups, MIN(doc_id) AS keeper_doc_id
        FROM documents GROUP BY fp ORDER BY fp""")),

    // ---- Repetition filter (Gopher-style quality rule) -------------------
    // Repetitious text (boilerplate, SEO spam, degenerate generations) is
    // the classic within-document quality signal: the fraction of
    // duplicate words and the share of the single most frequent bigram.
    // Both are ratios of exact integer counts (one IEEE division each —
    // oracle-exact). The max bigram multiplicity is computed WITHOUT a
    // (doc_id, gram) tally shuffle — repetition stays a pure per-row
    // projection like the rest of the text family, zero shuffles at any
    // scale. The oracle computes the same number as a per-gram
    // count-max. Thresholds follow the published Gopher rules' shape
    // (flag if the top bigram exceeds ~18% of bigrams or half the words
    // repeat).
    QueryDef("t47_repetition",
      (s, dir) => {
        // MaxPairMultiplicity consumes the WORD array directly: no
        // bigram strings, no gram array, primitive-long sort — measured
        // 16x over MaxRun(array_sort(shingles(w,2))) at sf0.1 (4.8s ->
        // 0.3s; the string pipeline's cost was concat_ws allocation +
        // byte-wise string sort). ArrayKernelsSpec pins equivalence to
        // the string path; see the kernel scaladoc for the 64-bit
        // collision caveat (~1e-13/doc). n_bigrams = size(w) - 1.
        val w = split(col("text"), " ")
        val best = graft.expressions.MaxPairMultiplicity(w)
        documents(s, dir)
          .filter(size(w) >= 2)
          .select(col("doc_id"),
            (lit(1.0) - size(array_distinct(w)).cast("double") / size(w))
              .as("dup_word_frac"),
            (best.cast("double") / (size(w) - 1)).as("top_bigram_frac"))
          .withColumn("flagged",
            col("top_bigram_frac") > 0.18 || col("dup_word_frac") > 0.5)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        base AS (SELECT doc_id,
                        CAST(1 AS DOUBLE) - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_frac,
                        w
                 FROM t WHERE len(w) >= 2),
        g AS (SELECT doc_id, dup_word_frac, unnest(${graft.functions.Similarity.duckShingles(2)}) AS g
              FROM base),
        c AS (SELECT doc_id, dup_word_frac, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
        a AS (SELECT doc_id, dup_word_frac, MAX(c) AS top_c, SUM(c) AS n_bigrams
              FROM c GROUP BY 1, 2)
        SELECT doc_id, dup_word_frac,
               CAST(top_c AS DOUBLE) / n_bigrams AS top_bigram_frac,
               (CAST(top_c AS DOUBLE) / n_bigrams > 0.18 OR dup_word_frac > 0.5) AS flagged
        FROM a ORDER BY doc_id""")))
}

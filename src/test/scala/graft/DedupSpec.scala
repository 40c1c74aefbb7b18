package graft

import org.apache.spark.sql.functions._

import graft.expressions.SortedOverlap
import graft.functions.Similarity.shingles

/** Dedup-family structural tests: block-key composition and verify-join
  * plan shape. Result correctness is covered by the DuckDB oracles
  * (d50–d58); these tests pin the SCALE properties the oracles can't
  * see — candidate cardinality and broadcast discipline. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Skewed fixture: every doc lands in ONE length bucket (same word
    * count), metadata splits it 4 ways, near-dup pairs planted strictly
    * within metadata groups — the corpus shape where composed blocking
    * pays without losing recall. */
  private def skewedDocs = {
    val groups = for {
      lang <- Seq("en", "de"); src <- Seq("a", "b")
    } yield (lang, src)
    val docs = groups.zipWithIndex.flatMap { case ((lang, src), g) =>
      (0 until 25).map { i =>
        val base = (0 until 16).map(w => s"w${g}_${i % 5}_$w").mkString(" ")
        // i%5 collapses each group's texts to 5 variants => dups inside
        // every (lang, src) group, none across groups
        (g * 100L + i, base, lang, src)
      }
    }
    docs.toDF("doc_id", "text", "lang", "source")
  }

  test("composed block key shrinks candidates without losing within-group pairs") {
    val lenOnly = DedupQueries.blockedCandidates(skewedDocs, Nil).count()
    val composed = DedupQueries.blockedCandidates(skewedDocs, Seq("lang", "source")).count()
    // one length bucket: len-only candidates are all-pairs C(100,2);
    // composition divides the bucket by the 4 metadata groups
    assert(lenOnly == 100L * 99 / 2)
    assert(composed == 4L * (25L * 24 / 2),
      s"expected 4 * C(25,2) composed candidates, got $composed")
    // recall: the true pairs are within-group, so the composed key keeps
    // every pair the length-only key finds
    val full = DedupQueries.bigramPairsOf(skewedDocs, Nil)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val comp = DedupQueries.bigramPairsOf(skewedDocs, Seq("lang", "source"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty, "fixture must plant near-dup pairs")
    assert(comp == full,
      "composed blocking lost within-group near-dup pairs")
  }

  test("composed block keys are null-safe: NULL-metadata docs still pair") {
    // Real corpora have nullable metadata; with plain equality NULL = NULL
    // is false, so every NULL-lang doc silently vanishes from candidate
    // generation (zero recall on that slice, invisible on null-free
    // testdata). The coalesce-to-sentinel key must keep NULL grouped with
    // NULL — and never smuggle a NULL doc into a real lang's block.
    val docs = Seq(
      (1L, "a b c d e f g h", null.asInstanceOf[String]),
      (2L, "a b c d e f g h", null.asInstanceOf[String]),
      (3L, "a b c d e f g h", "en"),
      (4L, "a b c d e f g h", "en")
    ).toDF("doc_id", "text", "lang")
    val cand = DedupQueries.blockedCandidates(docs, Seq("lang"))
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L), (3L, 4L)),
      s"NULL lang must block with NULL lang only, got $cand")
    // and the verify pipeline (which routes ids through the hot-block
    // semi join on the same keys) must surface the NULL-group pair too
    val pairs = DedupQueries.bigramPairsOf(docs, Seq("lang"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("d58 returns the same-lang subset of d53's pairs") {
    val d53 = DedupQueries.bigramPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val d58 = DedupQueries.bigramPairs(spark, sf, Seq("lang"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lang = Tables.documents(spark, sf)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(d58.subsetOf(d53))
    assert(d58 == d53.filter { case (a, b) => lang(a) == lang(b) })
  }

  test("d51 banding recall measured against exhaustive Jaccard ground truth") {
    // Ground truth: ALL pairs with trigram-shingle Jaccard >= 0.8 via an
    // exhaustive self-join (feasible at sf0.001). d51's banding is
    // probabilistic — P(candidate) = 1-(1-j^2)^BANDS, >= 0.997 at
    // j=0.8 with 6 bands of 2 — and its verify stage is exact, so the
    // output must be a SUBSET of truth with near-total recall.
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(shingles(col("w"), 3),
          x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")))).as("sh"))
    val truth = base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", SortedOverlap(col("a.sh"), col("b.sh")))
      .withColumn("j", col("inter").cast("double") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("j") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    val got = DedupQueries.defs.find(_.name == "d51_minhash_lsh").get
      .run(spark, sf).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture has no ground-truth near-dup pairs")
    assert(got.subsetOf(truth), "exact verify must never invent pairs")
    val recall = got.size.toDouble / truth.size
    info(s"d51 banding recall at j>=0.8: $recall (${got.size}/${truth.size})")
    assert(recall >= 0.9, s"banding recall $recall below the s-curve expectation")
  }

  test("verify path never force-broadcasts a corpus-derived frame") {
    // The candidate-restriction semi join must be present, and no
    // broadcast HINT may survive into the Join nodes of the optimized
    // plan (runtime broadcasts chosen by AQE on measured-small sides are
    // fine — the defect is overriding the size check with a corpus-sized
    // frame). NOTE: asserting on the "ResolvedHint" plan text is vacuous
    // — EliminateResolvedHint folds the hint into Join.hint during
    // optimization — so this walks the surviving JoinHint strategies
    // via BroadcastGuard instead (which BroadcastGuardSpec proves fires
    // on the defect shape).
    for (name <- Seq("d51_minhash_lsh", "d53_ngram_jaccard", "d57_containment")) {
      val df = DedupQueries.defs.find(_.name == name).get.run(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("LeftSemi"),
        s"$name: candidate-restriction semi join missing:\n$optimized")
      assert(BroadcastGuard.broadcastHintCount(df) == 0,
        s"$name: forced broadcast hint on the verify path")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

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

  test("verify path never force-broadcasts a corpus-derived frame") {
    // The candidate-restriction semi join must be present, and no
    // broadcast HINT may survive to the optimized plan (runtime
    // broadcasts chosen by AQE on measured-small sides are fine — the
    // defect is overriding the size check with a corpus-sized frame).
    for (name <- Seq("d51_minhash_lsh", "d53_ngram_jaccard", "d57_containment")) {
      val df = DedupQueries.defs.find(_.name == name).get.run(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("LeftSemi"),
        s"$name: candidate-restriction semi join missing:\n$optimized")
      assert(!optimized.contains("ResolvedHint"),
        s"$name: forced broadcast hint on the verify path:\n$optimized")
    }
  }
}

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

  test("banded block key bounds candidates by near-dup volume, not bucket size") {
    // The 100 TB occupancy bound: the fixture's single length bucket
    // holds all 100 docs — 20 identical-text clusters of 5 (4 metadata
    // groups × 5 variants; variants share ZERO words, so true near-dup
    // pairs are exactly 20 * C(5,2) = 200, all at j = 1.0). A length-only
    // key would make every bucket pair a candidate: C(100,2) = 4950,
    // quadratic in bucket size. The composed bucket × band key admits a
    // pair only when a MinHash band agrees — certain for identical
    // texts, a ~2^-32-per-shingle-hash fluke for disjoint ones — so
    // candidates track the planted near-dup volume. Ceilings, not exact
    // counts: BANDS/K tuning must not re-break this test.
    val truePairs = 20L * (5 * 4 / 2)
    val banded = DedupQueries.blockedCandidates(skewedDocs, Nil).count()
    assert(banded >= truePairs, s"banding lost identical-text pairs: $banded")
    assert(banded <= truePairs + 50,
      s"banded candidates must track near-dup volume (~$truePairs), got $banded (all-pairs = 4950)")
    // cell occupancy: no (bucket, band_id, bkey) cell may exceed its
    // identical-text cluster (5 docs) beyond hash-fluke slack
    val maxCell = DedupQueries.blockingCells(skewedDocs, Nil)
      .groupBy("bucket", "band_id", "bkey").count()
      .agg(max("count")).as[Long].head()
    assert(maxCell <= 10, s"cell occupancy must track cluster size (5), got $maxCell")
    // composing metadata only removes cross-group candidates — and the
    // true pairs are within-group, so verified output is unchanged
    val composed = DedupQueries.blockedCandidates(skewedDocs, Seq("lang", "source")).count()
    assert(composed <= banded)
    val full = DedupQueries.bigramPairsOf(skewedDocs, Nil)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val comp = DedupQueries.bigramPairsOf(skewedDocs, Seq("lang", "source"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full.size == truePairs,
      s"j=1.0 recall is deterministic (every band agrees): expected $truePairs, got ${full.size}")
    assert(comp == full,
      "composed blocking lost within-group near-dup pairs")
  }

  // ---- plain-Scala replay of the candidate formula ------------------------
  // The same derivation the DuckDB oracle encodes (duckBigramPairsSql) and
  // MinHashSig/bandKey compute, written a third way with MessageDigest +
  // BigInt — so agreement below pins Spark ≡ formula without trusting
  // either engine's implementation.
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  private def bigramShingles(text: String): Seq[String] =
    text.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq
  private def replayCells(text: String): (Int, Seq[String]) = {
    val words = text.split(" ")
    val bucket = words.length / 8
    val hs = bigramShingles(text).map(sh => java.lang.Long.parseLong(md5hex(sh).take(8), 16))
    val sig = (0 until DedupQueries.K).map(i =>
      hs.map(h => (h * (2L * i + 1) + (1000003L * i + 12345L)) % DedupQueries.P).min)
    val keys = (0 until DedupQueries.BANDS).map(b => md5hex(s"${sig(2 * b)}|${sig(2 * b + 1)}"))
    (bucket, keys)
  }
  private def replayCandidate(ta: String, tb: String): Boolean = {
    val (ba, ka) = replayCells(ta); val (bb, kb) = replayCells(tb)
    ba == bb && ka.zip(kb).exists { case (a, b) => a == b }
  }
  private def exactJaccard(ta: String, tb: String): Double = {
    val sa = bigramShingles(ta).toSet; val sb = bigramShingles(tb).toSet
    val inter = (sa & sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  test("borderline pairs: Spark candidates and output match the formula replay") {
    // Near the 0.5 verify threshold banding is genuinely probabilistic
    // (P(candidate) = 1-(1-j²)^BANDS ≈ 0.82 at j=0.5), so the contract
    // is NOT "every j≥0.5 pair is found" — it is that the engine and the
    // oracle make the SAME in-or-out call on every pair. Plant pairs
    // across j ≈ 0.33..0.71 (16-word docs sharing a p-word prefix:
    // j = (p-1)/(p+2s-1)) with disjoint per-pair vocabularies, and
    // assert pairwise equality of (1) Spark's candidate set vs the
    // replay and (2) the verified output vs replay ∧ exact-Jaccard.
    val fixtures = for {
      v <- 0 until 6            // vocabulary seeds: independent banding trials
                                // (6 seeds deterministically yield both an
                                // admitted and a dropped j>=0.5 pair — the
                                // v=4,p=11 j=0.5 pair misses all 6 bands)
      p <- Seq(8, 10, 11, 12, 13) // shared-prefix words => j in [0.33, 0.67]
    } yield {
      val s = 16 - p
      val shared = (0 until p).map(w => s"v${v}p${p}s$w")
      val ta = (shared ++ (0 until s).map(w => s"v${v}p${p}a$w")).mkString(" ")
      val tb = (shared ++ (0 until s).map(w => s"v${v}p${p}b$w")).mkString(" ")
      (v * 100L + p * 2L, v * 100L + p * 2L + 1, ta, tb)
    }
    val docs = fixtures.flatMap { case (ia, ib, ta, tb) =>
      Seq((ia, ta), (ib, tb)) }.toDF("doc_id", "text")
    val text = fixtures.flatMap { case (ia, ib, ta, tb) =>
      Seq(ia -> ta, ib -> tb) }.toMap
    val allPairs = for {
      a <- text.keys.toSeq.sorted; b <- text.keys.toSeq.sorted if a < b
    } yield (a, b)
    val expectCand = allPairs.filter { case (a, b) =>
      replayCandidate(text(a), text(b)) }.toSet
    val gotCand = DedupQueries.blockedCandidates(docs, Nil)
      .as[(Long, Long)].collect().toSet
    assert(gotCand == expectCand,
      s"Spark candidates diverge from the formula replay: " +
      s"spark-only=${gotCand -- expectCand}, replay-only=${expectCand -- gotCand}")
    // end-to-end: verified output == candidate ∧ exact bigram Jaccard ≥ 0.5
    val expectOut = expectCand.filter { case (a, b) =>
      exactJaccard(text(a), text(b)) >= 0.5 }
    val gotOut = DedupQueries.bigramPairsOf(docs, Nil)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(gotOut == expectOut)
    // non-vacuousness: the planted j≥0.5 pairs must exercise BOTH
    // branches of the banding decision — some admitted, some dropped —
    // or this test proves nothing about borderline agreement
    val nearThreshold = fixtures.collect {
      case (ia, ib, ta, tb) if exactJaccard(ta, tb) >= 0.5 =>
        replayCandidate(ta, tb)
    }
    info(s"j>=0.5 planted pairs admitted by banding: " +
      s"${nearThreshold.count(identity)}/${nearThreshold.size}")
    assert(nearThreshold.contains(true) && nearThreshold.contains(false),
      "fixture must plant j>=0.5 pairs on both sides of the banding decision " +
      "(tweak the vocabulary seeds if BANDS/K changed)")
  }

  test("banding knob: 12x1 banding recovers the borderline pair 6x2 misses") {
    // The documented s-curve shift (SCALE.md / blockingCells): at j=0.5
    // the default 2-row bands admit a pair with P = 1-(1-j²)^6 ≈ 0.82,
    // 1-row bands with P = 1-(1-j)^12 ≈ 0.9998. The v=4,p=11 fixture
    // from the borderline test is the deterministic ~0.18 case — a true
    // j=0.5 pair that misses ALL six 2-row bands — so it separates the
    // two knob settings on fixed data.
    val v = 4; val p = 11; val s = 16 - p
    val shared = (0 until p).map(w => s"v${v}p${p}s$w")
    val ta = (shared ++ (0 until s).map(w => s"v${v}p${p}a$w")).mkString(" ")
    val tb = (shared ++ (0 until s).map(w => s"v${v}p${p}b$w")).mkString(" ")
    assert(exactJaccard(ta, tb) === 0.5, "fixture must sit exactly on the threshold")
    assert(!replayCandidate(ta, tb),
      "fixture drifted: 6x2 banding now admits this pair (pick another seed)")
    val docs = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
    assert(DedupQueries.blockedCandidates(docs, Nil).count() === 0L,
      "default 6x2 banding should miss this borderline pair")
    // independent replay of the 1-row banding: key = md5("s_b") per band
    val replay1x12 = {
      def sig(text: String) = {
        val hs = bigramShingles(text).map(sh =>
          java.lang.Long.parseLong(md5hex(sh).take(8), 16))
        (0 until DedupQueries.K).map(i =>
          hs.map(h => (h * (2L * i + 1) + (1000003L * i + 12345L)) % DedupQueries.P).min)
      }
      sig(ta).zip(sig(tb)).exists { case (a, b) => md5hex(s"$a") == md5hex(s"$b") }
    }
    assert(replay1x12, "formula replay: some single minhash row must agree at j=0.5")
    val got = DedupQueries.blockedCandidates(docs, Nil, rowsPerBand = 1)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L)),
      "12x1 banding must admit the borderline pair the default misses")
    // and the knob only ADDS candidates — on the skewed fixture it must
    // still find every identical-text pair the default finds
    val wide = DedupQueries.blockedCandidates(skewedDocs, Nil, rowsPerBand = 1)
      .as[(Long, Long)].collect().toSet
    val dflt = DedupQueries.blockedCandidates(skewedDocs, Nil)
      .as[(Long, Long)].collect().toSet
    assert(dflt.subsetOf(wide), "left-shifted s-curve must not lose candidates")
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

  test("d55 components: deep chain resolves in O(log n) rounds, not O(diameter)") {
    // The corpus shape min-label propagation can't survive: an edit-chain
    // component (doc i near-dups doc i+1 only). Propagation needs
    // diameter=63 rounds; alternating large-star/small-star must collapse
    // it logarithmically — and still label every node with the component
    // min, the contract the d55/d59 oracles check.
    val n = 64
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = graft.operators.ConnectedComponents.runWithRounds(chain)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L until n).toSet, "every chained node must be labeled")
    assert(got.values.forall(_ == 0L), s"labels must be the component min: $got")
    assert(rounds <= 10, s"deep chain must resolve in O(log n) rounds, took $rounds")
    // two disjoint components + reversed/duplicated edges don't cross-label
    val messy = Seq((5L, 3L), (3L, 5L), (3L, 9L), (20L, 21L), (21L, 20L))
      .toDF("src", "dst")
    val m = graft.operators.ConnectedComponents.run(messy)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
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

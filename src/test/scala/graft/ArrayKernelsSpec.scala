package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.expressions.{MaxRun, MinHashSig, SortedOverlap}

class ArrayKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("SortedOverlap equals size(array_intersect) on sorted distinct arrays") {
    // Deterministic pseudo-random sorted-distinct long sets of varied size.
    val rows = (0 until 200).map { i =>
      def set(seed: Int, n: Int): Array[Long] =
        (0 until n).map(j => ((seed * 2654435761L + j * 40503L) % 97).abs).distinct.sorted.toArray
      (set(i, 5 + i % 40), set(i * 7 + 3, 5 + (i * 3) % 40))
    }
    val df = rows.toDF("a", "b")
    val viaKernel = df.select(SortedOverlap($"a", $"b")).as[Long].collect()
    val viaBuiltin = df.select(size(array_intersect($"a", $"b")).cast("long")).as[Long].collect()
    assert(viaKernel.toSeq === viaBuiltin.toSeq)
  }

  test("SortedOverlap handles empty and disjoint inputs") {
    val df = Seq(
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L))
    ).toDF("a", "b")
    assert(df.select(SortedOverlap($"a", $"b")).as[Long].collect().toSeq === Seq(0L, 0L, 3L))
  }

  test("SortedOverlap rejects non-array<bigint> input at analysis time") {
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SortedOverlap($"a", $"b")).collect()
    }
  }

  test("MinHashSig equals K declarative array_min(transform(...)) passes") {
    val K = 12; val P = 4294967311L
    val rows = (0 until 100).map { i =>
      Tuple1((0 until (3 + i % 30)).map(j => (i * 1000003L + j * 2654435761L) % 4294967296L).toArray)
    }
    val df = rows.toDF("hs")
    val viaKernel = df.select(MinHashSig($"hs", K, P).as("sig")).as[Seq[Long]].collect()
    val declCols = (0 until K).map { i =>
      array_min(transform($"hs", h => (h * lit(2 * i + 1) + lit(1000003L * i + 12345L)) % lit(P)))
    }
    val viaDecl = df.select(array(declCols: _*).as("sig")).as[Seq[Long]].collect()
    assert(viaKernel.toSeq === viaDecl.toSeq)
  }

  test("MinHashSig is null on empty or null input") {
    val df = Seq(Tuple1(Array.empty[Long]), Tuple1(null.asInstanceOf[Array[Long]])).toDF("hs")
    assert(df.select(MinHashSig($"hs", 4, 4294967311L)).collect().forall(_.isNullAt(0)))
  }

  test("MinHashSig rejects elements outside the 32-bit fingerprint range") {
    // >= 2^32 and negative both overflow h*(2i+1) — must be a clear error,
    // not a silently wrong signature. Exercises the codegen path.
    for (bad <- Seq(1L << 57, -1L)) {
      val df = Seq(Tuple1(Array(7L, bad))).toDF("hs")
      val e = intercept[Exception] {
        df.select(MinHashSig($"hs", 4, 4294967311L)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("32-bit fingerprint")))
    }
  }

  test("null array ELEMENTS null the kernels out instead of reading as 0") {
    val withNulls = Seq(Tuple1(Seq[Option[Long]](Some(1L), None, Some(5L))))
      .toDF("a")
    val out1 = withNulls
      .select(SortedOverlap($"a", typedlit(Seq(1L, 2L, 5L))))
      .collect()
    assert(out1.forall(_.isNullAt(0)))
    val out2 = withNulls.select(MinHashSig($"a", 4, 4294967311L)).collect()
    assert(out2.forall(_.isNullAt(0)))
  }

  test("MaxRun on a sorted array equals the max element multiplicity") {
    // Deterministic pseudo-random multisets from a small alphabet so
    // multiplicities vary; the kernel must match the groupBy definition.
    val rows = (0 until 200).map { i =>
      val n = 2 + (i * 13) % 60
      (0 until n).map(j => s"w${((i * 2654435761L + j * 40503L) % 7).abs}")
    }
    val df = rows.map(r => Tuple1(r.sorted)).toDF("a")
    val viaKernel = df.select(MaxRun($"a")).as[Long].collect()
    val viaAgg = rows.map(r =>
      r.groupBy(identity).values.map(_.size.toLong).max)
    assert(viaKernel.toSeq === viaAgg)
  }

  test("MaxRun: empty array is 0, a null element nulls the result out") {
    assert(Seq(Tuple1(Seq.empty[String])).toDF("a")
      .select(MaxRun($"a")).as[Long].head() === 0L)
    val withNull = Seq(Tuple1(Seq[String]("x", null, "x"))).toDF("a")
    assert(withNull.select(MaxRun($"a")).collect().head.isNullAt(0))
  }

  test("MaxPairMultiplicity equals MaxRun over sorted bigram shingles") {
    // The t47 hot kernel vs its string-pipeline definition: word lists
    // with repeated phrases so bigram multiplicities vary, including
    // words containing spaces-adjacent ambiguity breakers ("a b"+"c" vs
    // "a"+"b c" must NOT merge — the chained per-word hash is
    // boundary-aware where naive concatenation would not be).
    import graft.expressions.MaxPairMultiplicity
    import graft.functions.Similarity.shingles
    val rows = (0 until 200).map { i =>
      val n = 2 + (i * 13) % 60
      (0 until n).map(j => s"w${((i * 2654435761L + j * 40503L) % 5).abs}")
    } :+ Seq("ab", "c", "a", "bc", "ab", "c")
    val df = rows.map(Tuple1(_)).toDF("w")
    val got = df.select(MaxPairMultiplicity($"w")).as[Long].collect()
    val want = df.select(
      MaxRun(array_sort(shingles($"w", 2)))).as[Long].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("SimHash16 equals the declarative 16-vote aggregate pipeline") {
    // The d52 kernel vs its definition: per distinct token, vote ±1 per
    // bit from the parity of hex digit b of md5(token); bit set iff the
    // vote sum is positive. The declarative twin below is the exact
    // pre-r21 d52 dataflow (explode + 16 sums + simhashFromVotes), so
    // kernel equality here is oracle equality by transitivity. Mixed
    // lengths, multibyte, repeated tokens (array_distinct on both
    // sides), and the empty-string token.
    import graft.expressions.SimHash16
    import graft.functions.Similarity.{simhashFromVotes, simhashVoteFromHex}
    val rows = (0 until 300).map { i =>
      (i.toLong, (0 until 1 + i % 17)
        .map(j => s"tok${(i * 31 + j * 7) % 23}${if (j % 5 == 0) "é∆" else ""}")
        .mkString(" ") + (if (i % 11 == 0) " " else ""))
    }
    val df = rows.toDF("id", "text")
    val got = df.select($"id",
        SimHash16(array_distinct(split($"text", " "))).as("simhash"))
      .orderBy("id").as[(Long, Long)].collect()
    val tok = df.select($"id",
        explode(array_distinct(split($"text", " "))).as("tok"))
      .select($"id", md5($"tok").as("h"))
    val votes = (0 until 16).map(b => sum(simhashVoteFromHex($"h", b)).as(s"v$b"))
    val want = tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select($"id", simhashFromVotes((0 until 16).map(b => col(s"v$b"))).as("simhash"))
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === want.toSeq)
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val direct = SimHash16(Literal.create(Seq("a", "b"),
      ArrayType(StringType, containsNull = false))).eval(null)
    val viaDf = Seq(Tuple1(Seq("a", "b"))).toDF("w")
      .select(SimHash16($"w")).as[Long].head()
    assert(direct === viaDf)
    // empty array and null element -> null
    assert(Seq(Tuple1(Seq.empty[String])).toDF("w")
      .select(SimHash16($"w")).collect().head.isNullAt(0))
    assert(Seq(Tuple1(Seq[String]("x", null))).toDF("w")
      .select(SimHash16($"w")).collect().head.isNullAt(0))
  }

  test("Md5Prefix60 equals the conv(substring(md5(x),1,15),16,10) idiom") {
    // The dedup family's portable shingle hash, computed from digest
    // bytes instead of hex text. MUST be bit-identical — the DuckDB
    // oracles replay the hex-text idiom, so any divergence is an oracle
    // mismatch, not a perf bug. Mixed-length + multibyte + empty inputs.
    import graft.expressions.Md5Prefix60
    val rows = ((0 until 500).map(i =>
      s"shingle $i ${"x" * (i % 7)} é∆${i * 2654435761L}") :+ "").map(Tuple1(_))
    val df = rows.toDF("s")
    val got = df.select(Md5Prefix60($"s")).as[Long].collect()
    val want = df.select(
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long")).as[Long].collect()
    assert(got.toSeq === want.toSeq)
    // interpreted (non-codegen) path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val direct = graft.expressions.Md5Prefix60(
      Literal.create(rows.head._1)).eval(null)
    assert(direct === want.head)
    // null in -> null out
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("s")
    assert(n.select(Md5Prefix60($"s")).collect().head.isNullAt(0))
  }

  test("MaxPairMultiplicity: short arrays are 0, null element nulls out") {
    import graft.expressions.MaxPairMultiplicity
    assert(Seq(Tuple1(Seq.empty[String]), Tuple1(Seq("only")))
      .toDF("w").select(MaxPairMultiplicity($"w")).as[Long].collect()
      .toSeq === Seq(0L, 0L))
    val withNull = Seq(Tuple1(Seq[String]("x", null, "x"))).toDF("w")
    assert(withNull.select(MaxPairMultiplicity($"w")).collect().head.isNullAt(0))
  }

  test("every kernel agrees between codegen and interpreted evaluation") {
    // Spark silently falls back to interpreted eval (nullSafeEval) when
    // codegen fails or is disabled — a doGenCode/eval divergence would
    // surface only there, as wrong RESULTS, not an error. Pin both modes
    // equal for all six kernels over one mixed fixture (sizes, empties,
    // multibyte strings, repeated elements).
    import graft.expressions.{MaxPairMultiplicity, Md5Prefix60, QCosine}
    def longs(seed: Int, n: Int): Array[Long] =
      (0 until n).map(j => ((seed * 2654435761L + j * 40503L) % 4294967296L).abs)
        .distinct.sorted.toArray
    val rows = (0 until 64).map { i =>
      (longs(i, i % 9),                       // sorted-distinct set (overlap)
       longs(i * 7 + 3, (i * 3) % 9),
       longs(i + 1, 8).map(_ % 1021),         // quantized vec (qcosine)
       longs(i + 5, 8).map(_ % 1021),
       (0 until i % 11).map(j => s"w${j % 4}é").toArray, // words w/ repeats
       s"doc $i ${"α" * (i % 5)}")             // multibyte text
    }
    val df = rows.toDF("a", "b", "qa", "qb", "w", "s")
    def allKernels = df.select(
      SortedOverlap($"a", $"b"),
      MinHashSig($"a", 4, 4294967311L),
      QCosine($"qa", $"qb"),
      MaxRun($"w"),
      MaxPairMultiplicity($"w"),
      Md5Prefix60($"s"))
    def withModes[T](wholeStage: String, factory: String)(body: => T): T = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
        spark.conf.set("spark.sql.codegen.factoryMode", factory)
        body
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
          spark.conf.set("spark.sql.codegen.factoryMode", _))
      }
    }
    val viaCodegen = withModes("true", "CODEGEN_ONLY")(
      allKernels.collect().map(_.toSeq).toSeq)
    val viaInterp = withModes("false", "NO_CODEGEN")(
      allKernels.collect().map(_.toSeq).toSeq)
    assert(viaCodegen === viaInterp)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.expressions.QCosine
import graft.functions.{Planes, Similarity}
import graft.functions.Similarity._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce overlapping word n-grams") {
    val out = Seq("a b c d").toDF("text")
      .select(split($"text", " ").as("w"))
      .select(shingles($"w", 2).as("s"))
      .as[Seq[String]].head()
    assert(out === Seq("a b", "b c", "c d"))
  }

  test("shingles of a too-short token array is empty, not garbage") {
    val out = Seq("a b", "a", "").toDF("text")
      .select(split($"text", " ").as("w"))
      .select(shingles($"w", 3).as("s"))
      .as[Seq[String]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("quantize floors to integer thousandths") {
    val out = Seq(Tuple1(Array(0.0015f, -0.5f, 1.0f))).toDF("e")
      .select(quantize($"e").as("q")).as[Seq[Long]].head()
    assert(out === Seq(1L, -500L, 1000L))
  }

  test("qdot is the exact integer dot product") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(qdot($"a", $"b")).as[Long].head() === 32L)
  }

  test("qcosine matches the declared IEEE shape; orthogonal is exactly 0.0") {
    val df = Seq(
      (Array(2L, 4L), Array(1L, 2L)),
      (Array(1L, 0L), Array(0L, 7L))
    ).toDF("a", "b")
    val out = df.select(
      qcosine(qdot($"a", $"b"), qdot($"a", $"a"), qdot($"b", $"b"))).as[Double].collect()
    // dot/(sqrt(na)*sqrt(nb)) — the exact expression the oracle replays;
    // for (10,20,5) that is 10/(sqrt(20)*sqrt(5)), NOT exactly 1.0.
    assert(out(0) === 10.0 / (math.sqrt(20.0) * math.sqrt(5.0)))
    assert(out(0) > 0.999999999 && out(0) <= 1.0)
    assert(out(1) === 0.0)
  }

  test("QCosine expression matches the declarative qcosine bit-for-bit") {
    val vecs = (1 to 50).map { i =>
      (Array.tabulate(16)(d => ((i * 31 + d * 17) % 2001 - 1000).toLong),
       Array.tabulate(16)(d => ((i * 13 + d * 7) % 2001 - 1000).toLong))
    }
    val df = vecs.toDF("a", "b")
    val decl = df.select(
      qcosine(qdot($"a", $"b"), qdot($"a", $"a"), qdot($"b", $"b")).as("c")).as[Double].collect()
    val expr = df.select(QCosine($"a", $"b").as("c")).as[Double].collect()
    assert(decl.toSeq === expr.toSeq)
  }

  test("QCosine is null on length mismatch or null input") {
    val df = Seq(
      (Array(1L, 2L), Array(1L, 2L, 3L)),
      (null.asInstanceOf[Array[Long]], Array(1L))
    ).toDF("a", "b")
    val out = df.select(QCosine($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("hamming counts differing bits") {
    val df = Seq((0x0fL, 0xf0L), (5L, 5L)).toDF("a", "b")
    assert(df.select(hamming($"a", $"b")).as[Long].collect().toSeq === Seq(8L, 0L))
  }

  test("simhash votes are ±1 and assemble into a 16-bit hash") {
    val df = Seq("tok").toDF("t")
    val vote = df.select(simhashVote($"t", 0)).as[Long].head()
    assert(vote === 1L || vote === -1L)
    val hash = df.select(simhashFromVotes((0 until 16).map(b => simhashVote($"t", b))))
      .as[Long].head()
    assert(hash >= 0L && hash < (1L << 16))
  }

  test("Planes coefficients are deterministic and bounded") {
    val p = Planes.planes(4, 8)
    assert(p === Planes.planes(4, 8))
    assert(p.flatten.forall(c => c >= -1000 && c <= 1000))
    assert(Planes.coeff(0, 1) === Planes.coeff(0, 1))
    // not all-equal (sanity that hashing actually varies)
    assert(p.flatten.distinct.size > 1)
  }

  test("duckHexToLong agrees with Spark conv() on md5 prefixes") {
    // Evaluate the generated DuckDB SQL shape in Spark: DuckDB's
    // strpos(haystack, needle) is Spark's instr(haystack, needle).
    val df = Seq("abc", "xyz").toDF("t").select(md5($"t").as("h"))
    val viaConv = df.select(conv(substring($"h", 1, 2), 16, 10).cast("long")).as[Long].collect()
    val manual = df.select(
      ((expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
       (expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)).cast("long")
    ).as[Long].collect()
    assert(viaConv.toSeq === manual.toSeq)
    // and the generator emits that exact arithmetic
    assert(Similarity.duckHexToLong("h", 2).contains("strpos"))
  }

  test("s61 LSH recall measured vs brute force at two plane counts") {
    // Mirrors the IVF recall test (s64/s65): ground truth is the exact
    // all-pairs top-3 per query; s61's recall is measured at NPLANES=4
    // and 8 to pin the knob's direction — more planes means smaller
    // buckets (cheaper) and no higher recall. Deterministic: md5-derived
    // planes, quantized-integer cosine, total tie order.
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", qdot(col("q"), col("q")))
      .filter(col("nrm") > 0)
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
              qcosine(qdot(col("a.q"), col("b.q")), col("a.nrm"), col("b.nrm")).as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    def recall(nplanes: Int): Double = {
      val got = SimilarityQueries.lshAnn(nplanes)(spark, sf)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      val hits = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      hits.sum / hits.size
    }
    def candidatePairs(nplanes: Int): Long =
      SimilarityQueries.lshBuckets(nplanes)(spark, sf)
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1)).as("p")).as[Long].head()
    val r4 = recall(4); val r8 = recall(8)
    val c4 = candidatePairs(4); val c8 = candidatePairs(8)
    info(s"s61 recall r4=$r4 r8=$r8; candidate pairs c4=$c4 c8=$c8")
    assert(r4 >= r8, s"coarser buckets must not lose recall: r4=$r4 r8=$r8")
    assert(c8 < c4, s"more planes must cut candidate pairs: c4=$c4 c8=$c8")
    // Absolute recall is bounded by the corpus, not the algorithm: these
    // synthetic embeddings are near-uniform on the sphere, so a "top-3
    // neighbor" is barely above ambient similarity and a single sign
    // split loses it — measured r4≈0.14, r8≈0.02 (13x fewer candidate
    // pairs). On clustered real
    // embeddings the same pipeline's recall rises with cluster
    // coherence; what this test pins is the knob's DIRECTION and a
    // floor that catches broken bucketing (recall ≈ 0 at 4 planes).
    assert(r4 > 0.05, s"recall at 4 planes implausibly low ($r4) — bucketing broken?")
  }
}
